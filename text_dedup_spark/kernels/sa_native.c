/* Suffix array + LCP in C, replacing the per-task constant of the numpy
 * prefix-doubling kernel (suffix_array_kernel.py), which remains the
 * fallback and the cross-check oracle in tests.
 *
 * SA construction: SA-IS — induced sorting with recursion on the reduced
 * LMS-substring problem, O(n) time, from the published algorithm in
 * Nong, Zhang & Chan, "Two Efficient Algorithms for Linear Time Suffix
 * Array Construction" (IEEE Trans. Computers 2011; DCC 2009). Implemented
 * here from the paper's description. LCP: Kasai et al., "Linear-Time
 * Longest-Common-Prefix Computation" (CPM 2001).
 *
 * The SA-IS body is macro-instantiated twice: a uint16 top level (byte
 * values shifted +1, sentinel 0 — half the memory traffic of int32 in the
 * random-access induce sweeps) and an int32 level for recursion, whose
 * reduced alphabets can exceed 16 bits.
 *
 * Compiled on demand by sa_native.py (cc -O2 -shared -fPIC).
 *
 * Contract: n < 2^31; sa/lcp are caller-allocated int32[n]; lcp[0] = 0,
 * lcp[i] = LCP(suffix sa[i-1], suffix sa[i]). Returns 0 on success,
 * -1 on allocation failure.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* i is LMS iff it is S-type and its left neighbour is L-type */
#define IS_LMS(t, i) ((i) > 0 && (t)[(i)] && !(t)[(i) - 1])

static void bucket_bounds(const int32_t *cnt, int64_t K, int32_t *bkt,
                          int ends) {
    /* int64 running sum: at the maximum admitted n (2^31 - 1 plus the
     * sentinel) an int32 sum would hit signed-overflow UB right at the
     * documented bound; each bkt[c] itself stays < n and fits int32. */
    int64_t sum = 0;
    for (int64_t c = 0; c < K; c++) {
        sum += cnt[c];
        bkt[c] = (int32_t)(ends ? sum : sum - cnt[c]);
    }
}

static int sais_i32(const int32_t *s, int32_t *sa, int64_t n, int64_t K);

/* DEFINE_SAIS(SFX, CHAR_T):
 *   induce_SFX — one induced-sorting sweep: given LMS suffixes pre-placed
 *     in sa (all other slots -1), derive every L-suffix left-to-right from
 *     bucket heads, then every S-suffix right-to-left from bucket ends.
 *   lms_equal_SFX — equality of the LMS substrings starting at a and b
 *     (both LMS, a != b). The unique smallest sentinel guarantees a
 *     mismatch before either index can run off the end.
 *   sais_SFX — the full recursion step; s has length n over alphabet
 *     [0, K) with s[n-1] == 0 the unique smallest sentinel. Recursion is
 *     always into the int32 instantiation (reduced alphabets grow). */
#define DEFINE_SAIS(SFX, CHAR_T)                                              \
static void induce_##SFX(const CHAR_T *s, int32_t *sa, int64_t n, int64_t K, \
                         const uint8_t *t, const int32_t *cnt,                \
                         int32_t *bkt) {                                      \
    bucket_bounds(cnt, K, bkt, 0);                                            \
    for (int64_t i = 0; i < n; i++) {                                         \
        int64_t j = sa[i];                                                    \
        if (j > 0 && !t[j - 1]) sa[bkt[s[j - 1]]++] = (int32_t)(j - 1);       \
    }                                                                         \
    bucket_bounds(cnt, K, bkt, 1);                                            \
    for (int64_t i = n - 1; i >= 0; i--) {                                    \
        int64_t j = sa[i];                                                    \
        if (j > 0 && t[j - 1]) sa[--bkt[s[j - 1]]] = (int32_t)(j - 1);        \
    }                                                                         \
}                                                                             \
                                                                              \
static int lms_equal_##SFX(const CHAR_T *s, const uint8_t *t, int64_t a,     \
                           int64_t b) {                                       \
    for (int64_t i = 0;; i++) {                                               \
        if (s[a + i] != s[b + i] || t[a + i] != t[b + i]) return 0;           \
        if (i > 0 && (IS_LMS(t, a + i) || IS_LMS(t, b + i)))                  \
            return IS_LMS(t, a + i) && IS_LMS(t, b + i);                      \
    }                                                                         \
}                                                                             \
                                                                              \
static int sais_##SFX(const CHAR_T *s, int32_t *sa, int64_t n, int64_t K) {  \
    if (n == 1) { sa[0] = 0; return 0; }                                      \
    uint8_t *t = malloc((size_t)n);                                           \
    int32_t *cnt = malloc((size_t)K * sizeof(int32_t));                       \
    int32_t *bkt = malloc((size_t)K * sizeof(int32_t));                       \
    if (!t || !cnt || !bkt) { free(t); free(cnt); free(bkt); return -1; }     \
                                                                              \
    t[n - 1] = 1;                                                             \
    for (int64_t i = n - 2; i >= 0; i--)                                      \
        t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;   \
    memset(cnt, 0, (size_t)K * sizeof(int32_t));                              \
    for (int64_t i = 0; i < n; i++) cnt[s[i]]++;                              \
                                                                              \
    /* pass 1: LMS suffixes in text order at bucket ends, then induce —      \
     * this sorts the LMS *substrings* */                                     \
    for (int64_t i = 0; i < n; i++) sa[i] = -1;                               \
    bucket_bounds(cnt, K, bkt, 1);                                            \
    for (int64_t i = 1; i < n; i++)                                           \
        if (IS_LMS(t, i)) sa[--bkt[s[i]]] = (int32_t)i;                       \
    induce_##SFX(s, sa, n, K, t, cnt, bkt);                                   \
                                                                              \
    /* compact the sorted LMS positions into sa[0..n1) and name their        \
     * substrings into sa[n1..n) indexed by pos/2 (LMS positions are >= 2    \
     * apart, and n - n1 >= n/2 >= the needed slots) */                       \
    int64_t n1 = 0;                                                           \
    for (int64_t i = 0; i < n; i++)                                           \
        if (IS_LMS(t, sa[i])) sa[n1++] = sa[i];                               \
    int32_t *names = sa + n1;                                                 \
    for (int64_t i = n1; i < n; i++) sa[i] = -1;                              \
    int64_t n_names = 0, prev = -1;                                           \
    for (int64_t i = 0; i < n1; i++) {                                        \
        int64_t pos = sa[i];                                                  \
        if (prev < 0 || !lms_equal_##SFX(s, t, prev, pos)) {                  \
            n_names++;                                                        \
            prev = pos;                                                       \
        }                                                                     \
        names[pos / 2] = (int32_t)(n_names - 1);                              \
    }                                                                         \
                                                                              \
    /* reduced problem: the name of each LMS substring, in text order.       \
     * Its suffix order == the order of the LMS suffixes of s. */             \
    int32_t *s1 = malloc((size_t)n1 * sizeof(int32_t));                       \
    int32_t *p1 = malloc((size_t)n1 * sizeof(int32_t));                       \
    int32_t *sa1 = malloc((size_t)n1 * sizeof(int32_t));                      \
    if (!s1 || !p1 || !sa1) {                                                 \
        free(s1); free(p1); free(sa1);                                        \
        free(t); free(cnt); free(bkt);                                        \
        return -1;                                                            \
    }                                                                         \
    int64_t k = 0;                                                            \
    for (int64_t i = 1; i < n; i++)                                           \
        if (IS_LMS(t, i)) { p1[k] = (int32_t)i; s1[k++] = names[i / 2]; }     \
    if (n_names < n1) {                                                       \
        /* duplicate names: recurse (s1 ends with the sentinel's name 0,     \
         * still the unique smallest) */                                      \
        if (sais_i32(s1, sa1, n1, n_names) != 0) {                            \
            free(s1); free(p1); free(sa1);                                    \
            free(t); free(cnt); free(bkt);                                    \
            return -1;                                                        \
        }                                                                     \
    } else {                                                                  \
        for (int64_t i = 0; i < n1; i++) sa1[s1[i]] = (int32_t)i;             \
    }                                                                         \
                                                                              \
    /* pass 2: LMS suffixes in their true order at bucket ends, induce the   \
     * final suffix array */                                                  \
    for (int64_t i = 0; i < n; i++) sa[i] = -1;                               \
    bucket_bounds(cnt, K, bkt, 1);                                            \
    for (int64_t i = n1 - 1; i >= 0; i--) {                                   \
        int64_t j = p1[sa1[i]];                                               \
        sa[--bkt[s[j]]] = (int32_t)j;                                         \
    }                                                                         \
    induce_##SFX(s, sa, n, K, t, cnt, bkt);                                   \
                                                                              \
    free(s1); free(p1); free(sa1);                                            \
    free(t); free(cnt); free(bkt);                                            \
    return 0;                                                                 \
}

DEFINE_SAIS(i32, int32_t)
DEFINE_SAIS(u16, uint16_t)

int build_sa(const uint8_t *data, int64_t n, int32_t *sa) {
    if (n <= 0) return 0;
    if (n == 1) { sa[0] = 0; return 0; }
    /* shift bytes up by one and append the 0 sentinel; drop its (first)
     * suffix from the result */
    int64_t m = n + 1;
    uint16_t *s = malloc((size_t)m * sizeof(uint16_t));
    int32_t *sa2 = malloc((size_t)m * sizeof(int32_t));
    if (!s || !sa2) { free(s); free(sa2); return -1; }
    for (int64_t i = 0; i < n; i++) s[i] = (uint16_t)(data[i] + 1);
    s[n] = 0;
    int rc = sais_u16(s, sa2, m, 257);
    if (rc == 0) memcpy(sa, sa2 + 1, (size_t)n * sizeof(int32_t));
    free(s);
    free(sa2);
    return rc;
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
