// Native runtime helpers for lambda_tpu.
//
// The reference implements these in C++ via its submodules; here they are
// TPU-framework host-side equivalents:
//
//  * sw_traceback_batch — the traceback pass of the two-pass extension
//    (pass 2 over e-value survivors, /root/reference/src/search_algo.hpp:1296
//    via SeqAn2).  The score pass runs on the TPU (Pallas); survivors are
//    few, and a host DP avoids shipping per-cell direction matrices over
//    the device link.  Semantics (tie-breaking, best-cell selection, gap
//    convention) replicate lambda_tpu/ops/sw_xla.py exactly so outputs are
//    identical whichever path runs.
//
//  * bgzf_compress_block — BGZF block encoding for BAM output (the
//    reference uses SeqAn2's bgzf writer; ours mirrors the format:
//    gzip member with BC extra field, raw-deflate payload).
//
// Build: g++ -O3 -fPIC -shared -fopenmp lambda_native.cpp -o liblambda_native.so -lz

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <parallel/algorithm>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Smith-Waterman with affine gaps + traceback (local, free end gaps).
//
// Conventions (identical to ops/sw_xla.py and search_algo.hpp:226-230):
//   gap_first  = score of a gap's first char (open+extend), negative
//   gap_extend = score of each further gap char, negative
//   'M' consumes both, 'D' consumes subject only, 'I' consumes query only.
//
// Direction encoding per cell (same as sw_xla):
//   bits 0-1: H source (0 stop, 1 diag, 2 from E, 3 from F)
//   bit 2: E came from E (extend) on ties-prefer-extend
//   bit 3: F came from F (extend)
// Best cell: maximum H; ties broken by smallest (i+j), then smallest i —
// matching the first-maximum-in-(antidiagonal, row)-scan-order rule of the
// device kernel.
// ---------------------------------------------------------------------------

static const int32_t NEG = -(1 << 24);

// Align one pair; returns score.  ops buffer receives single-char ops
// from alignment END to START (caller reverses); *ops_len set.
// band: diagonal band size — only cells with (j - i) in [0, band]
// (1-based DP indices; equals the 0-based char-diagonal) are computed,
// the shared banded semantics of ops/sw_band.py.  band >= slen is
// effectively unbanded.  Out-of-band neighbor reads hit the untouched
// initial values (Hrow 0 / Frow NEG), which are exactly the banded
// boundary conditions.
static int32_t sw_one(const int32_t* q, int32_t qlen,
                      const int32_t* s, int32_t slen, int32_t band,
                      const int32_t* subst, int32_t alph,
                      int32_t gap_first, int32_t gap_extend,
                      int32_t* q0_out, int32_t* s0_out,
                      int32_t* qe_out, int32_t* se_out,
                      uint8_t* ops, int32_t ops_cap, int32_t* ops_len) {
    // only the 1-byte direction matrix is O(qlen*slen); H/E/F roll by row
    const int64_t W = (int64_t)slen + 1;
    const bool banded = band >= 0;
    std::vector<int32_t> Hrow(W, 0), Frow(W, NEG);
    std::vector<uint8_t> D((int64_t)(qlen + 1) * W, 0);

    int32_t best = 0, bi = 0, bj = 0;
    int64_t bestd = INT64_MAX;

    for (int32_t i = 1; i <= qlen; ++i) {
        const int32_t* srow = subst + (int64_t)q[i - 1] * alph;
        const int32_t jlo = banded ? i : 1;          // d = j - i >= 0
        const int32_t jhi = banded ? std::min(i + band, slen) : slen;
        if (jlo > jhi) break;
        int32_t h_diag = Hrow[jlo - 1];  // H(i-1, jlo-1), in band (d=0)
        int32_t h_left = 0;         // H(i, jlo-1) out of band: boundary 0
        int32_t e_left = NEG;       // E(i, jlo-1) out of band: -inf
        for (int32_t j = jlo; j <= jhi; ++j) {
            int32_t e_ext = e_left + gap_extend;
            int32_t e_opn = h_left + gap_first;
            int32_t e = e_ext >= e_opn ? e_ext : e_opn;
            // F(i, j) from row i-1: Frow[j] = F(i-1, j), Hrow[j] still
            // holds H(i-1, j) here (overwritten below)
            int32_t f_ext = Frow[j] + gap_extend;
            int32_t f_opn = Hrow[j] + gap_first;
            int32_t f = f_ext >= f_opn ? f_ext : f_opn;
            int32_t diag = h_diag + srow[s[j - 1]];
            int32_t h = 0;
            if (diag > h) h = diag;
            if (e > h) h = e;
            if (f > h) h = f;
            uint8_t code = 0;
            if (h > 0) {
                // priority on ties: diag > E > F (matches sw_xla)
                if (h == f) code = 3;
                if (h == e) code = 2;
                if (h == diag) code = 1;
            }
            if (e_ext >= e_opn) code |= 4;
            if (f_ext >= f_opn) code |= 8;
            D[(int64_t)i * W + j] = code;
            h_diag = Hrow[j];   // save H(i-1, j) before overwrite
            Hrow[j] = h;
            Frow[j] = f;
            h_left = h;
            e_left = e;
            const int64_t d = (int64_t)i + j;
            if (h > best ||
                (h == best && h > 0 &&
                 (d < bestd || (d == bestd && i < bi)))) {
                best = h;
                bi = i;
                bj = j;
                bestd = d;
            }
        }
    }

    // traceback (sw_xla.traceback)
    int32_t i = bi, j = bj, n = 0;
    char state = 'H';
    while (true) {
        uint8_t code = (i + j >= 2 && i >= 0 && j >= 0)
                           ? D[(int64_t)i * W + j] : 0;
        if (state == 'H') {
            uint8_t h = code & 3;
            if (h == 0 || i <= 0 || j <= 0) break;
            if (h == 1) {
                if (n < ops_cap) ops[n] = 'M';
                ++n; --i; --j;
            } else if (h == 2) {
                state = 'E';
            } else {
                state = 'F';
            }
        } else if (state == 'E') {
            if (n < ops_cap) ops[n] = 'D';
            ++n;
            bool ext = code & 4;
            --j;
            state = ext ? 'E' : 'H';
        } else {
            if (n < ops_cap) ops[n] = 'I';
            ++n;
            bool ext = code & 8;
            --i;
            state = ext ? 'F' : 'H';
        }
    }
    *q0_out = i;
    *s0_out = j;
    *qe_out = bi;
    *se_out = bj;
    *ops_len = n;
    return best;
}

// Score-only SW (pass 1 CPU fallback): O(qlen) memory, no traceback.
// band: see sw_one (cells with j - i in [0, band]; band < 0 = unbanded).
// nc/x_drop: chunk-granular X-drop early exit replicating the Pallas
// lane kernel's LAMBDA_SW_XDROP semantics (sw_band_xdrop_reference):
// after every nc columns, if max(H, E, 0) over the column's band has
// fallen more than x_drop below the best (and best > 0), the alignment
// is dead.  x_drop <= 0 or nc <= 0 disables.
static int32_t sw_score_one(const int32_t* q, int32_t qlen,
                            const int32_t* s, int32_t slen, int32_t band,
                            const int32_t* subst, int32_t alph,
                            int32_t gap_first, int32_t gap_extend,
                            int32_t nc, int32_t x_drop) {
    const bool banded = band >= 0;
    std::vector<int32_t> H(qlen + 1, 0), E(qlen + 1, NEG);
    int32_t best = 0;
    for (int32_t j = 1; j <= slen; ++j) {
        const int32_t* scol = subst + (int64_t)s[j - 1];
        const int32_t ilo = banded ? std::max(1, j - band) : 1;
        const int32_t ihi = banded ? std::min(qlen, j) : qlen;
        if (ilo > ihi) continue;
        int32_t f = NEG;
        int32_t h_diag = H[ilo - 1];  // H(ilo-1, j-1): 0 or fresh at d=band
        int32_t h_up = 0;   // H(ilo-1, j) is boundary/out-of-band: 0
        int32_t colmax = 0;
        for (int32_t i = ilo; i <= ihi; ++i) {
            int32_t e = E[i] + gap_extend;
            int32_t eo = H[i] + gap_first;
            if (eo > e) e = eo;
            int32_t fo = h_up + gap_first;
            f += gap_extend;
            if (fo > f) f = fo;
            int32_t h = h_diag + scol[(int64_t)q[i - 1] * alph];
            if (h < 0) h = 0;
            if (e > h) h = e;
            if (f > h) h = f;
            h_diag = H[i];
            H[i] = h;
            E[i] = e;
            h_up = h;
            if (h > best) best = h;
            if (h > colmax) colmax = h;
            if (e > colmax) colmax = e;
        }
        if (x_drop > 0 && nc > 0 && j % nc == 0 && best > 0 &&
            colmax < best - x_drop)
            break;
    }
    return best;
}

void sw_score_batch_host(const int32_t* q, int32_t q_stride,
                         const int32_t* qlen,
                         const int32_t* s, int32_t s_stride,
                         const int32_t* slen, int32_t B,
                         const int32_t* subst, int32_t alph,
                         const int32_t* subst_rev, const uint8_t* use_rev,
                         const int32_t* band,
                         int32_t gap_first, int32_t gap_extend,
                         const int32_t* nc, int32_t x_drop,
                         int32_t* score_out) {
#pragma omp parallel for schedule(dynamic, 8)
    for (int32_t b = 0; b < B; ++b) {
        const int32_t* mat =
            (subst_rev && use_rev && use_rev[b]) ? subst_rev : subst;
        score_out[b] = sw_score_one(q + (int64_t)b * q_stride, qlen[b],
                                    s + (int64_t)b * s_stride, slen[b],
                                    band ? band[b] : -1,
                                    mat, alph, gap_first, gap_extend,
                                    nc ? nc[b] : 0, x_drop);
    }
}

// Batched entry point.  q/s are (B, q_stride)/(B, s_stride) row-major
// int32 rank arrays; per-row lengths in qlen/slen.  ops_out is
// (B, ops_stride) uint8 receiving ops from alignment START to END.
void sw_traceback_batch(const int32_t* q, int32_t q_stride,
                        const int32_t* qlen,
                        const int32_t* s, int32_t s_stride,
                        const int32_t* slen, int32_t B,
                        const int32_t* subst, int32_t alph,
                        // bisulfite: optional second matrix + per-row flag
                        const int32_t* subst_rev, const uint8_t* use_rev,
                        const int32_t* band,
                        int32_t gap_first, int32_t gap_extend,
                        int32_t* score_out, int32_t* q0_out, int32_t* s0_out,
                        int32_t* qe_out, int32_t* se_out,
                        uint8_t* ops_out, int32_t ops_stride,
                        int32_t* ops_len_out) {
#pragma omp parallel for schedule(dynamic, 1)
    for (int32_t b = 0; b < B; ++b) {
        const int32_t* mat =
            (subst_rev && use_rev && use_rev[b]) ? subst_rev : subst;
        uint8_t* ops = ops_out + (int64_t)b * ops_stride;
        int32_t n = 0;
        score_out[b] = sw_one(q + (int64_t)b * q_stride, qlen[b],
                              s + (int64_t)b * s_stride, slen[b],
                              band ? band[b] : -1,
                              mat, alph, gap_first, gap_extend,
                              &q0_out[b], &s0_out[b], &qe_out[b], &se_out[b],
                              ops, ops_stride, &n);
        if (n > ops_stride) n = ops_stride;
        std::reverse(ops, ops + n);
        ops_len_out[b] = n;
    }
}

// Traceback + inline alignment statistics (the per-match tail the
// reference compiles at search_algo.hpp:1302-1325: _expandAlign +
// computeAlignmentStats).  Stats semantics replicate
// lambda_tpu/search/records.py compute_alignment_stats exactly:
//   standard: match == character equality; bisulfite: match ==
//   (score(c0,c1) == score(c0,c0)); positives: score > 0.
// stats_out is (B, 8) int32 rows:
//   [align_length, matches, mismatches, positives,
//    gap_opens, gaps, insertions, deletions]
void sw_traceback_stats_batch(
    const int32_t* q, int32_t q_stride, const int32_t* qlen,
    const int32_t* s, int32_t s_stride, const int32_t* slen, int32_t B,
    const int32_t* subst, int32_t alph,
    const int32_t* subst_rev, const uint8_t* use_rev,
    const int32_t* band, int32_t gap_first, int32_t gap_extend,
    int32_t bs_mode,
    int32_t* score_out, int32_t* q0_out, int32_t* s0_out,
    int32_t* qe_out, int32_t* se_out,
    uint8_t* ops_out, int32_t ops_stride, int32_t* ops_len_out,
    int32_t* stats_out) {
    // the DP + traceback IS sw_traceback_batch — one implementation of
    // the alignment contract; this entry point only adds the stats walk
    sw_traceback_batch(q, q_stride, qlen, s, s_stride, slen, B,
                       subst, alph, subst_rev, use_rev, band,
                       gap_first, gap_extend,
                       score_out, q0_out, s0_out, qe_out, se_out,
                       ops_out, ops_stride, ops_len_out);
#pragma omp parallel for schedule(dynamic, 1)
    for (int32_t b = 0; b < B; ++b) {
        const int32_t* mat =
            (subst_rev && use_rev && use_rev[b]) ? subst_rev : subst;
        const uint8_t* ops = ops_out + (int64_t)b * ops_stride;
        const int32_t n = ops_len_out[b];

        // stats over the walked path (records.py semantics)
        const int32_t* qr = q + (int64_t)b * q_stride;
        const int32_t* sr = s + (int64_t)b * s_stride;
        int32_t i = q0_out[b], j = s0_out[b];
        int32_t matches = 0, mismatches = 0, positives = 0;
        int32_t gap_opens = 0, gap_ext = 0, ins = 0, del = 0;
        char prev = 0;
        for (int32_t t = 0; t < n; ++t) {
            const char op = (char)ops[t];
            if (op == 'M') {
                const int32_t c0 = qr[i], c1 = sr[j];
                const int32_t sc = mat[(int64_t)c0 * alph + c1];
                const bool is_match =
                    bs_mode ? (sc == mat[(int64_t)c0 * alph + c0])
                            : (c0 == c1);
                if (is_match) ++matches; else ++mismatches;
                if (sc > 0) ++positives;
                ++i; ++j;
            } else if (op == 'D') {   // gap in query row
                if (prev == 'D') ++gap_ext; else ++gap_opens;
                ++del; ++j;
            } else {                  // 'I': gap in subject row
                if (prev == 'I') ++gap_ext; else ++gap_opens;
                ++ins; ++i;
            }
            prev = op;
        }
        int32_t* st = stats_out + (int64_t)b * 8;
        st[0] = n;
        st[1] = matches;
        st[2] = mismatches;
        st[3] = positives;
        st[4] = gap_opens;
        st[5] = gap_opens + gap_ext;
        st[6] = ins;
        st[7] = del;
    }
}

// ---------------------------------------------------------------------------
// Parallel stable lexicographic row sort for k-mer index construction
// (the native-build counterpart of the reference's threaded FM-index
// construction, mkindex_algo.hpp:600-618).  keys: (P, words<=4) uint32
// row-major, big-endian significance; writes the stable sort order.
// ---------------------------------------------------------------------------

namespace {
struct Row128 {
    uint64_t hi, lo;
    int64_t idx;
};
}  // namespace

// Pack, for every global position p of every frame, the next
// chars_per_word*words characters (rank+1, MSB-first, sentinel 0 past the
// frame end) into uint32 key words (build_position_keys equivalent).
void pack_position_keys(const uint8_t* concat, int64_t P,
                        const int64_t* offsets, int64_t n_frames,
                        int32_t bits, int32_t words, uint32_t* keys) {
    const int32_t cpw = 32 / bits;
    const uint32_t align = 32 - cpw * bits;
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t f = 0; f < n_frames; ++f) {
        const int64_t end = offsets[f + 1];
        for (int64_t p = offsets[f]; p < end; ++p) {
            uint32_t* out = keys + p * words;
            int64_t j = p;
            for (int32_t w = 0; w < words; ++w) {
                uint32_t word = 0;
                for (int32_t c = 0; c < cpw; ++c, ++j) {
                    uint32_t v = j < end ? (uint32_t)concat[j] + 1 : 0;
                    word = (word << bits) | v;
                }
                out[w] = word << align;
            }
        }
    }
}

void sort_rows_u32(const uint32_t* keys, int64_t P, int32_t words,
                   int64_t* order) {
    std::vector<Row128> rows(P);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < P; ++i) {
        const uint32_t* r = keys + i * words;
        uint32_t w0 = words > 0 ? r[0] : 0;
        uint32_t w1 = words > 1 ? r[1] : 0;
        uint32_t w2 = words > 2 ? r[2] : 0;
        uint32_t w3 = words > 3 ? r[3] : 0;
        rows[i].hi = ((uint64_t)w0 << 32) | w1;
        rows[i].lo = ((uint64_t)w2 << 32) | w3;
        rows[i].idx = i;
    }
    __gnu_parallel::sort(rows.begin(), rows.end(),
                         [](const Row128& a, const Row128& b) {
                             if (a.hi != b.hi) return a.hi < b.hi;
                             if (a.lo != b.lo) return a.lo < b.lo;
                             return a.idx < b.idx;  // stable
                         });
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < P; ++i) order[i] = rows[i].idx;
}

// Parallel row gather: dst[i, :] = src[order[i], :] (uint32 rows).
// The remaining serial numpy step of the index build: applying the sort
// order to the key array and the frame ids — at UniProt scale these are
// multi-hundred-MB gathers worth all cores (reference builds its index
// on all threads, mkindex_algo.hpp:601-611).
void take_rows_u32(const uint32_t* src, int64_t P, int32_t words,
                   const int64_t* order, uint32_t* dst) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < P; ++i) {
        const uint32_t* r = src + order[i] * (int64_t)words;
        uint32_t* d = dst + i * (int64_t)words;
        for (int32_t w = 0; w < words; ++w) d[w] = r[w];
    }
}

// Parallel frame-id gather fused with the frame_of_pos expansion:
// out[i] = frame_of(order[i]) where frame_of(p) is the index f with
// offsets[f] <= p < offsets[f+1] (binary search per row — avoids
// materializing the O(P) np.repeat expansion at all).
void take_frame_of_pos(const int64_t* offsets, int64_t n_frames,
                       const int64_t* order, int64_t P, uint32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < P; ++i) {
        const int64_t p = order[i];
        int64_t lo = 0, hi = n_frames;   // find f: offsets[f] <= p
        while (lo + 1 < hi) {
            const int64_t mid = (lo + hi) / 2;
            if (offsets[mid] <= p) lo = mid; else hi = mid;
        }
        out[i] = (uint32_t)lo;
    }
}

// ---------------------------------------------------------------------------
// Match widening merge passes (search_algo.hpp:1148-1169): pairwise merge
// left->right, swallow right->left, unique-mask — over rows pre-sorted by
// (qid, sid, qs, qe, ss, se).  Exact replication of the reference loops
// (and of the Python fallback in search/extend.py).
// ---------------------------------------------------------------------------

// dlo/dhi: per-match diagonal band (subjectPos - queryPos, absolute;
// the extension band semantics of ops/sw_band.py).  Merging rows unions
// their bands so the surviving row's band covers every collapsed seed.
void merge_passes(int64_t* qid, int64_t* sid, int64_t* qs, int64_t* qe,
                  int64_t* ss, int64_t* se, int64_t* dlo, int64_t* dhi,
                  uint8_t* keep, int64_t n) {
    for (int64_t i = 0; i + 1 < n; ++i) {
        if (qid[i] == qid[i + 1] && sid[i] == sid[i + 1] &&
            se[i] >= ss[i + 1]) {
            se[i] = se[i + 1];
            ss[i + 1] = ss[i];
            dlo[i] = dlo[i + 1] = std::min(dlo[i], dlo[i + 1]);
            dhi[i] = dhi[i + 1] = std::max(dhi[i], dhi[i + 1]);
        }
    }
    for (int64_t i = n - 2; i >= 0; --i) {
        if (qid[i] == qid[i + 1] && sid[i] == sid[i + 1] &&
            ss[i + 1] < se[i]) {
            qs[i] = qs[i + 1];
            qe[i] = qe[i + 1];
            ss[i] = ss[i + 1];
            se[i] = se[i + 1];
            dlo[i] = std::min(dlo[i], dlo[i + 1]);
            dhi[i] = std::max(dhi[i], dhi[i + 1]);
        }
    }
    for (int64_t i = 0; i < n; ++i) {
        keep[i] = i == 0 || qid[i] != qid[i - 1] || sid[i] != sid[i - 1] ||
                  qs[i] != qs[i - 1] || qe[i] != qe[i - 1] ||
                  ss[i] != ss[i - 1] || se[i] != se[i - 1];
    }
}

// ---------------------------------------------------------------------------
// BGZF block compression (BAM container).  Encodes `len` input bytes
// (must be <= 65535) as one BGZF block into out (cap >= 65536+64);
// returns block size or -1.
// ---------------------------------------------------------------------------

int32_t bgzf_compress_block(const uint8_t* data, int32_t len, int32_t level,
                            uint8_t* out, int32_t out_cap) {
    if (len > 65535) return -1;
    // raw deflate
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    std::vector<uint8_t> comp(len + 1024);
    zs.next_in = const_cast<uint8_t*>(data);
    zs.avail_in = len;
    zs.next_out = comp.data();
    zs.avail_out = comp.size();
    if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
        deflateEnd(&zs);
        return -1;
    }
    int32_t clen = (int32_t)zs.total_out;
    deflateEnd(&zs);

    int32_t bsize = 18 + clen + 8;  // header + payload + crc32/isize
    if (bsize > 65536 || bsize > out_cap) return -1;  // BSIZE is uint16
    uint8_t* p = out;
    const uint8_t hdr[16] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                             6, 0, 'B', 'C', 2, 0};
    std::memcpy(p, hdr, 16);
    uint16_t bs16 = (uint16_t)(bsize - 1);
    p[16] = bs16 & 0xff;
    p[17] = bs16 >> 8;
    std::memcpy(p + 18, comp.data(), clen);
    uint32_t crc = crc32(0, data, len);
    uint32_t isz = (uint32_t)len;
    std::memcpy(p + 18 + clen, &crc, 4);
    std::memcpy(p + 18 + clen + 4, &isz, 4);
    return bsize;
}

// ---------------------------------------------------------------------------
// Parallel gzip member (pigz-style independent chunks): each chunk is
// raw-deflated independently (ending on a Z_FULL_FLUSH boundary, the
// last with Z_FINISH), so OpenMP threads compress chunks concurrently
// and the concatenation is one VALID gzip member.  The reference uses
// bio::io's threaded transparent_ostream for the same purpose
// (mkindex.cpp:241, search output streams).  Deterministic for a fixed
// chunk size regardless of thread count.  Returns bytes written or -1.
// ---------------------------------------------------------------------------

int64_t gzip_compress_parallel(const uint8_t* data, int64_t len,
                               int32_t chunk, int32_t level,
                               uint8_t* out, int64_t out_cap) {
    if (chunk <= 0) chunk = 1 << 20;
    const int64_t n_chunks = len > 0 ? (len + chunk - 1) / chunk : 1;
    std::vector<std::vector<uint8_t>> bufs(n_chunks);
    std::vector<uint32_t> crcs(n_chunks, 0);
    std::vector<int> ok(n_chunks, 1);

#pragma omp parallel for schedule(dynamic, 1)
    for (int64_t i = 0; i < n_chunks; ++i) {
        const uint8_t* p = data + i * chunk;
        const int64_t  n = std::min<int64_t>(chunk, len - i * chunk);
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                         Z_DEFAULT_STRATEGY) != Z_OK) {
            ok[i] = 0;
            continue;
        }
        bufs[i].resize(deflateBound(&zs, (uLong)std::max<int64_t>(n, 1))
                       + 64);
        zs.next_in = const_cast<uint8_t*>(p);
        zs.avail_in = (uInt)n;
        zs.next_out = bufs[i].data();
        zs.avail_out = (uInt)bufs[i].size();
        const int flush = (i == n_chunks - 1) ? Z_FINISH : Z_FULL_FLUSH;
        const int rc = deflate(&zs, flush);
        if ((flush == Z_FINISH && rc != Z_STREAM_END) ||
            (flush != Z_FINISH && rc != Z_OK)) {
            ok[i] = 0;
        }
        bufs[i].resize(zs.total_out);
        deflateEnd(&zs);
        crcs[i] = crc32(0, p, (uInt)n);
    }
    for (int64_t i = 0; i < n_chunks; ++i)
        if (!ok[i]) return -1;

    int64_t total = 10 + 8;
    for (auto& b : bufs) total += (int64_t)b.size();
    if (total > out_cap) return -1;
    uint8_t* w = out;
    const uint8_t hdr[10] = {0x1f, 0x8b, 8, 0, 0, 0, 0, 0, 0, 0xff};
    std::memcpy(w, hdr, 10);
    w += 10;
    uint32_t crc = 0;
    int64_t isize = 0;
    for (int64_t i = 0; i < n_chunks; ++i) {
        std::memcpy(w, bufs[i].data(), bufs[i].size());
        w += bufs[i].size();
        const int64_t n = std::min<int64_t>(chunk, len - i * chunk);
        crc = i == 0 ? crcs[i]
                     : (uint32_t)crc32_combine(crc, crcs[i], (z_off_t)n);
        isize += n;
    }
    uint32_t isz = (uint32_t)isize;
    std::memcpy(w, &crc, 4);
    std::memcpy(w + 4, &isz, 4);
    return total;
}

}  // extern "C"
