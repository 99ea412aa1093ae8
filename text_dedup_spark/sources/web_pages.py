"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates the input-hint table ``(url, warc_ts, html, text, lang)`` with
planted structure driving the dup-pair recall checks:
- ~60% unique docs (zipfian vocab, 50-400 words),
- ~25% near-duplicate cluster members (cluster sizes 2-8, mutation rates
  cycling {0, 2, 5, 10, 20}% word substitutions/deletions),
- ~10% exact duplicates (byte-identical text, distinct url) — exercises the
  exact path and LSH hot-band skew,
- ~5% short docs (< min_length tokens) — exercises the min-length filter and
  the all-zero-SimHash edge.

Everything is seeded; no external data. A ``truth`` sidecar maps url ->
planted cluster label (singletons label themselves).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _vocab(rng: np.random.RandomState, size: int = 4000) -> np.ndarray:
    # pronounceable-ish deterministic tokens
    syll = np.array(
        ["ka", "lo", "mi", "ra", "tu", "ben", "sor", "vel", "din", "pa",
         "qu", "zen", "fo", "gar", "hi", "jun", "kel", "lum", "nor", "ost"]
    )
    words = []
    for i in range(size):
        n = 2 + (i % 3)
        idx = rng.randint(0, len(syll), size=n)
        words.append("".join(syll[idx]) + str(i % 97))
    return np.array(words)


@dataclass
class WebPagesCorpus:
    pages: pd.DataFrame  # url, warc_ts, html, text, lang
    truth: pd.DataFrame  # url, cluster_label (planted)


def make_web_pages(n_docs: int = 1000, seed: int = 42) -> WebPagesCorpus:
    rng = np.random.RandomState(seed)
    vocab = _vocab(rng)
    # zipfian word distribution over the vocab (inverse-CDF sampling — much
    # faster than rng.choice(p=...) for large corpora)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    cum = np.cumsum(probs)

    def sample_doc(n_words: int) -> list[str]:
        return list(vocab[np.searchsorted(cum, rng.rand(n_words))])

    texts: list[str] = []
    labels: list[int] = []
    doc_i = 0
    mutation_rates = [0.0, 0.02, 0.05, 0.10, 0.20]
    mut_i = 0
    while doc_i < n_docs:
        u = rng.rand()
        if u < 0.60:  # unique
            texts.append(" ".join(sample_doc(rng.randint(50, 400))))
            labels.append(doc_i)
            doc_i += 1
        elif u < 0.85:  # near-dup cluster
            csize = int(rng.randint(2, 9))
            base = sample_doc(int(rng.randint(80, 300)))
            cluster_label = doc_i
            for _ in range(min(csize, n_docs - doc_i)):
                rate = mutation_rates[mut_i % len(mutation_rates)]
                mut_i += 1
                words = list(base)
                n_mut = int(len(words) * rate)
                for _ in range(n_mut):
                    pos = rng.randint(0, len(words))
                    if rng.rand() < 0.5 and len(words) > 10:
                        words.pop(pos)
                    else:
                        words[pos] = str(vocab[np.searchsorted(cum, rng.rand())])
                texts.append(" ".join(words))
                labels.append(cluster_label)
                doc_i += 1
        elif u < 0.95:  # exact duplicates
            copies = int(rng.randint(2, 5))
            t = " ".join(sample_doc(int(rng.randint(60, 200))))
            cluster_label = doc_i
            for _ in range(min(copies, n_docs - doc_i)):
                texts.append(t)
                labels.append(cluster_label)
                doc_i += 1
        else:  # short doc (< 5 tokens)
            texts.append(" ".join(sample_doc(int(rng.randint(1, 5)))))
            labels.append(doc_i)
            doc_i += 1

    n = len(texts)
    urls = [f"https://site{i % 973}.example/p/{i}" for i in range(n)]
    warc_ts = [EPOCH + timedelta(seconds=137 * i) for i in range(n)]
    langs = ["en", "de", "fr", "lt"]
    lang = [langs[i % 4] for i in range(n)]
    html = [f"<html><body><p>{t}</p></body></html>".encode("utf-8") for t in texts]
    pages = pd.DataFrame(
        {"url": urls, "warc_ts": warc_ts, "html": html, "text": texts, "lang": lang}
    )
    truth = pd.DataFrame({"url": urls, "cluster_label": labels})
    return WebPagesCorpus(pages=pages, truth=truth)


def extract_text_expr():
    """html:binary -> text:string — deterministic vectorized extraction for
    the synthetic wrapper, used to evidence the byte-identical-per-url
    invariant (BASELINE.json input_hint). Real-world extraction would slot in
    here as another pandas UDF; the Spark-side plumbing is identical."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def extract(html: pd.Series) -> pd.Series:
        prefix, suffix = b"<html><body><p>", b"</p></body></html>"

        def one(b: bytes | None) -> str | None:
            if b is None:
                return None
            if b.startswith(prefix) and b.endswith(suffix):
                return b[len(prefix) : len(b) - len(suffix)].decode("utf-8")
            return b.decode("utf-8", errors="ignore")

        return html.map(one)

    return extract
