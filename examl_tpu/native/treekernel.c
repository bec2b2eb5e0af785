/* treekernel — native host-side tree operations for large trees.
 *
 * The TPU framework keeps tree topology and SPR bookkeeping on the host
 * (like the reference keeps them on every rank); at 10^4-10^5 taxa the
 * per-SPR-cycle pointer chasing (traversal descriptors, canonical topology
 * comparison for the best-tree cache, bipartition hashing for the RF
 * convergence test) becomes the host bottleneck. This library provides
 * those operations over flat edge arrays (reference counterparts:
 * examl/newviewGenericSpecial.c computeTraversalInfo :691,
 * examl/topologies.c saveTree/cmpTopol :300-500,
 * examl/bipartitionList.c convergenceCriterion :520).
 *
 * Representation: ring-record encoding matching the Python Tree —
 * tips 1..n are records 3*i; inner node i (n+1..2n-2) has ring records
 * 3*i, 3*i+1, 3*i+2; back[] maps record -> record (-1 = unhooked).
 *
 * Build: cc -O2 -shared -fPIC -o libtreekernel.so treekernel.c
 */
#define _GNU_SOURCE             /* qsort_r prototype (glibc) */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define RING_NEXT(r) (((r) % 3 == 2) ? (r) - 2 : (r) + 1)

typedef struct {
    uint64_t lo;
    uint64_t hi;
    int min_tip;
} subtree_sig;

static uint64_t mix64(uint64_t x) {
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
}

/* ------------------------------------------------------------------ */
/* canonical topology hash: subtrees combined in min-tip order, so the
 * hash is invariant to ring rotations and child order (the "standard
 * order" of the reference's saveTree). Iterative post-order to survive
 * 10^5-taxon trees without blowing the C stack. */

static subtree_sig hash_subtree(const int64_t *back, int n_tips, int64_t rec,
                                subtree_sig *memo, unsigned char *done)
{
    /* explicit stack of records to process */
    int64_t *stack = (int64_t *)malloc(sizeof(int64_t) * 6 * (size_t)n_tips + 64);
    long sp = 0;
    stack[sp++] = rec;

    while (sp > 0) {
        int64_t r = stack[sp - 1];
        int node = (int)(r / 3);
        if (node <= n_tips) {
            memo[r].lo = mix64((uint64_t)node * 2654435761ULL + 1);
            memo[r].hi = mix64((uint64_t)node * 0x9e3779b97f4a7c15ULL + 7);
            memo[r].min_tip = node;
            done[r] = 1;
            sp--;
            continue;
        }
        int64_t c1 = back[RING_NEXT(r)];
        int64_t c2 = back[RING_NEXT(RING_NEXT(r))];
        if (!done[c1]) { stack[sp++] = c1; continue; }
        if (!done[c2]) { stack[sp++] = c2; continue; }
        subtree_sig a = memo[c1], b = memo[c2];
        if (b.min_tip < a.min_tip) { subtree_sig t = a; a = b; b = t; }
        subtree_sig s;
        s.lo = mix64(a.lo * 3 + mix64(b.lo * 5 + 11));
        s.hi = mix64(a.hi * 7 + mix64(b.hi * 13 + 17));
        s.min_tip = a.min_tip;
        memo[r] = s;
        done[r] = 1;
        sp--;
    }
    subtree_sig out = memo[rec];
    free(stack);
    return out;
}

/* canonical 128-bit topology hash of the tree containing tip 1.
 * back: int64[3*(2*n_tips)] ring-record back map. out: uint64[2]. */
void canonical_topology_hash(const int64_t *back, int n_tips, uint64_t *out)
{
    size_t nrec = 3 * (size_t)(2 * n_tips);
    subtree_sig *memo = (subtree_sig *)calloc(nrec, sizeof(subtree_sig));
    unsigned char *done = (unsigned char *)calloc(nrec, 1);

    /* root at tip 1's edge: hash(subtree behind tip1's back) combined with
     * tip 1 */
    int64_t root = back[3];   /* tip 1 = record 3 */
    subtree_sig s = hash_subtree(back, n_tips, root, memo, done);
    out[0] = mix64(s.lo + 0x1234567);
    out[1] = mix64(s.hi + 0x89abcdef);
    free(memo);
    free(done);
}

/* ------------------------------------------------------------------ */
/* bipartitions: for each inner edge, the set of tips below it on the side
 * away from tip 1, encoded as a hash of the sorted tip bitset. We hash
 * incrementally: subtree tip-set hash = sum of per-tip hashes (commutative,
 * so it is order-invariant), which identifies a bipartition up to
 * (vanishingly unlikely) collisions. Returns the number of non-trivial
 * bipartitions written. */
int bipartition_hashes(const int64_t *back, int n_tips, uint64_t *out)
{
    size_t nrec = 3 * (size_t)(2 * n_tips);
    uint64_t *sum = (uint64_t *)calloc(nrec, sizeof(uint64_t));
    int *count = (int *)calloc(nrec, sizeof(int));
    unsigned char *done = (unsigned char *)calloc(nrec, 1);
    int64_t *stack = (int64_t *)malloc(sizeof(int64_t) * 6 * (size_t)n_tips + 64);
    long sp = 0;
    int n_out = 0;

    int64_t root = back[3];
    stack[sp++] = root;
    while (sp > 0) {
        int64_t r = stack[sp - 1];
        int node = (int)(r / 3);
        if (node <= n_tips) {
            sum[r] = mix64((uint64_t)node * 0x9e3779b97f4a7c15ULL + 3);
            count[r] = 1;
            done[r] = 1;
            sp--;
            continue;
        }
        int64_t c1 = back[RING_NEXT(r)];
        int64_t c2 = back[RING_NEXT(RING_NEXT(r))];
        if (!done[c1]) { stack[sp++] = c1; continue; }
        if (!done[c2]) { stack[sp++] = c2; continue; }
        sum[r] = sum[c1] + sum[c2];
        count[r] = count[c1] + count[c2];
        done[r] = 1;
        /* non-trivial bipartition: more than one tip below, and not the
         * all-but-tip-1 set */
        if (count[r] > 1 && count[r] < n_tips - 1)
            out[n_out++] = sum[r];
        sp--;
    }
    free(sum); free(count); free(done); free(stack);
    return n_out;
}

/* symmetric-difference size of two bipartition hash sets (RF distance).
 * Both arrays are modified (sorted in place). */
static int cmp_u64(const void *a, const void *b)
{
    uint64_t x = *(const uint64_t *)a, y = *(const uint64_t *)b;
    return (x < y) ? -1 : (x > y);
}

int rf_distance_hashes(uint64_t *a, int na, uint64_t *b, int nb)
{
    qsort(a, (size_t)na, sizeof(uint64_t), cmp_u64);
    qsort(b, (size_t)nb, sizeof(uint64_t), cmp_u64);
    int i = 0, j = 0, common = 0;
    while (i < na && j < nb) {
        if (a[i] == b[j]) { common++; i++; j++; }
        else if (a[i] < b[j]) i++;
        else j++;
    }
    return (na - common) + (nb - common);
}

/* ------------------------------------------------------------------ */
/* alignment column sort (the parser's sitesort, reference
 * parser/axml.c:1421-1530): sort column keys (site_model bytes followed
 * by the per-taxon tip codes) lexicographically by memcmp. Stable via
 * an index tie-break, so the order matches numpy's stable lexsort of
 * the same keys exactly. One memcmp qsort replaces one stable argsort
 * pass per taxon (the numpy fallback packs 8 taxa per uint64 key and
 * still pays n_taxa/8 passes). */

typedef struct {
    const unsigned char *keys;
    size_t len;
} colctx;

static int col_cmp(const void *a, const void *b, void *arg)
{
    const colctx *c = (const colctx *)arg;
    int64_t ia = *(const int64_t *)a;
    int64_t ib = *(const int64_t *)b;
    int r = memcmp(c->keys + (size_t)ia * c->len,
                   c->keys + (size_t)ib * c->len, c->len);
    if (r)
        return r;
    return (ia > ib) - (ia < ib);
}

void sort_columns(const unsigned char *keys, int64_t n, int64_t len,
                  int64_t *order)
{
    colctx ctx;
    int64_t i;
    ctx.keys = keys;
    ctx.len = (size_t)len;
    for (i = 0; i < n; i++)
        order[i] = i;
    qsort_r(order, (size_t)n, sizeof(int64_t), col_cmp, &ctx);
}
