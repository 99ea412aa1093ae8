/* Suffix array + LCP, C implementation of the same algorithms as
 * suffix_array_kernel.py (this repo's own numpy prefix-doubling kernel) —
 * ported for the per-task constant: radix-sorted prefix doubling
 * (O(n log n), Manber-Myers family) for the SA, Kasai's algorithm
 * (O(n), "Linear-Time Longest-Common-Prefix Computation", CPM 2001)
 * for the LCP. No rank levels are retained (Kasai replaces the
 * binary-decomposition LCP), cutting task memory from ~4*log2(n) bytes
 * per corpus byte to a handful of flat int32 arrays.
 *
 * Compiled on demand by sa_native.py (gcc -O2 -shared -fPIC); the numpy
 * kernel remains the fallback and the cross-check oracle in tests.
 *
 * Contract: n < 2^31; sa/lcp are caller-allocated int32[n]; lcp[0] = 0,
 * lcp[i] = LCP(suffix sa[i-1], suffix sa[i]). Returns 0 on success,
 * -1 on allocation failure.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* stable counting sort of idx by key[idx[i]] (keys in [0, range)) */
static void counting_sort(const int32_t *key, const int32_t *src,
                          int32_t *dst, int32_t *cnt, int64_t n,
                          int64_t range) {
    memset(cnt, 0, (size_t)(range + 1) * sizeof(int32_t));
    for (int64_t i = 0; i < n; i++) cnt[key[src[i]] + 1]++;
    for (int64_t r = 0; r < range; r++) cnt[r + 1] += cnt[r];
    for (int64_t i = 0; i < n; i++) dst[cnt[key[src[i]]]++] = src[i];
}

int build_sa(const uint8_t *data, int64_t n, int32_t *sa) {
    if (n <= 0) return 0;
    if (n == 1) { sa[0] = 0; return 0; }
    /* key ranges never exceed n + 1 (ranks < n, +1 for the out-of-bounds
     * sentinel 0), and the first round uses byte values (< 257) */
    int64_t crange = (n + 2 > 257) ? n + 2 : 257;
    int32_t *rank = malloc((size_t)n * sizeof(int32_t));
    int32_t *tmp = malloc((size_t)n * sizeof(int32_t));
    int32_t *k2 = malloc((size_t)n * sizeof(int32_t));
    int32_t *ord = malloc((size_t)n * sizeof(int32_t));
    int32_t *cnt = malloc((size_t)(crange + 1) * sizeof(int32_t));
    if (!rank || !tmp || !k2 || !ord || !cnt) {
        free(rank); free(tmp); free(k2); free(ord); free(cnt);
        return -1;
    }
    for (int64_t i = 0; i < n; i++) { rank[i] = data[i]; ord[i] = (int32_t)i; }
    /* initial sort by first byte */
    counting_sort(rank, ord, sa, cnt, n, 256);
    /* initial ranks from the byte order */
    {
        int32_t r = 0;
        tmp[sa[0]] = 0;
        for (int64_t i = 1; i < n; i++) {
            if (data[sa[i]] != data[sa[i - 1]]) r++;
            tmp[sa[i]] = r;
        }
        memcpy(rank, tmp, (size_t)n * sizeof(int32_t));
        if ((int64_t)r == n - 1) goto done;
    }
    for (int64_t k = 1; k < n; k <<= 1) {
        /* second key: rank[i+k] + 1, 0 past the end (shorter-first, the
         * same -1-padding convention as the numpy kernel) */
        for (int64_t i = 0; i < n; i++)
            k2[i] = (i + k < n) ? rank[i + k] + 1 : 0;
        /* LSD radix: stable sort by k2, then stable by rank */
        counting_sort(k2, sa, ord, cnt, n, n + 1);
        counting_sort(rank, ord, sa, cnt, n, n);
        /* relabel */
        int32_t r = 0;
        tmp[sa[0]] = 0;
        for (int64_t i = 1; i < n; i++) {
            int32_t a = sa[i], b = sa[i - 1];
            if (rank[a] != rank[b] || k2[a] != k2[b]) r++;
            tmp[a] = r;
        }
        memcpy(rank, tmp, (size_t)n * sizeof(int32_t));
        if ((int64_t)r == n - 1) break;
    }
done:
    free(rank); free(tmp); free(k2); free(ord); free(cnt);
    return 0;
}

/* Kasai et al. 2001: lcp over SA order, O(n) */
int build_lcp(const uint8_t *data, int64_t n, const int32_t *sa,
              int32_t *lcp) {
    if (n <= 0) return 0;
    int32_t *inv = malloc((size_t)n * sizeof(int32_t));
    if (!inv) return -1;
    for (int64_t i = 0; i < n; i++) inv[sa[i]] = (int32_t)i;
    int64_t h = 0;
    lcp[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = inv[i];
        if (r > 0) {
            int64_t j = sa[r - 1];
            while (i + h < n && j + h < n && data[i + h] == data[j + h]) h++;
            lcp[r] = (int32_t)h;
            if (h > 0) h--;
        } else {
            h = 0;
        }
    }
    free(inv);
    return 0;
}

int build_sa_lcp(const uint8_t *data, int64_t n, int32_t *sa, int32_t *lcp) {
    int rc = build_sa(data, n, sa);
    if (rc != 0) return rc;
    return build_lcp(data, n, sa, lcp);
}
