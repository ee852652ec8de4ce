// Native host-side hot loops for fastplong-tpu.
//
// The TPU compute path is JAX/Pallas; these are the host runtime pieces the
// reference implements natively (FASTQ scan, batch packing, gzip member
// compression via libdeflate — reference src/fastqreader.cpp,
// src/writer.cpp) exposed through a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC host_io.cpp -o libfplhost.so -ldeflate

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

struct libdeflate_compressor;
libdeflate_compressor* libdeflate_alloc_compressor(int level);
void libdeflate_free_compressor(libdeflate_compressor*);
size_t libdeflate_gzip_compress_bound(libdeflate_compressor*, size_t);
size_t libdeflate_gzip_compress(libdeflate_compressor*, const void*, size_t,
                                void*, size_t);

// ---------------------------------------------------------------- parsing

// Scans `buf[0..n)` for 4-line FASTQ records (fast path: perfectly regular
// records, name starts '@', strand starts '+', len(qual)==len(seq)).
// Fills the five int64 offset arrays (capacity `max_records`).
// Returns the number of records parsed; *consumed is the byte offset after
// the last full record; *ok is 0 if an irregularity was found (caller
// falls back to the tolerant Python parser).
int64_t fpl_parse_fastq(const uint8_t* buf, int64_t n, int64_t max_records,
                        int64_t* name_off, int64_t* name_len,
                        int64_t* seq_off, int64_t* seq_len,
                        int64_t* strand_off, int64_t* strand_len,
                        int64_t* qual_off,
                        int64_t* consumed, int* ok) {
    int64_t count = 0;
    int64_t pos = 0;
    *ok = 1;
    while (count < max_records) {
        if (pos >= n) break;
        // name line
        const uint8_t* p = (const uint8_t*)memchr(buf + pos, '\n', n - pos);
        if (!p) break;
        int64_t name_end = p - buf;
        if (buf[pos] != '@') { *ok = 0; break; }
        int64_t nlen = name_end - pos;
        if (nlen > 0 && buf[name_end - 1] == '\r') nlen--;
        int64_t s_off = name_end + 1;
        // sequence line
        p = (const uint8_t*)memchr(buf + s_off, '\n', n - s_off);
        if (!p) break;
        int64_t seq_end = p - buf;
        int64_t slen = seq_end - s_off;
        if (slen > 0 && buf[seq_end - 1] == '\r') slen--;
        int64_t t_off = seq_end + 1;
        // strand line
        if (t_off >= n) break;
        p = (const uint8_t*)memchr(buf + t_off, '\n', n - t_off);
        if (!p) break;
        int64_t strand_end = p - buf;
        if (buf[t_off] != '+') { *ok = 0; break; }
        int64_t tlen = strand_end - t_off;
        if (tlen > 0 && buf[strand_end - 1] == '\r') tlen--;
        int64_t q_off = strand_end + 1;
        // quality line
        if (q_off >= n) break;
        p = (const uint8_t*)memchr(buf + q_off, '\n', n - q_off);
        if (!p) break;
        int64_t qual_end = p - buf;
        int64_t qlen = qual_end - q_off;
        if (qlen > 0 && buf[qual_end - 1] == '\r') qlen--;
        if (qlen != slen) { *ok = 0; break; }

        name_off[count] = pos;   name_len[count] = nlen;
        seq_off[count] = s_off;  seq_len[count] = slen;
        strand_off[count] = t_off; strand_len[count] = tlen;
        qual_off[count] = q_off;
        count++;
        pos = qual_end + 1;
    }
    *consumed = pos;
    return count;
}

// ---------------------------------------------------------------- packing

// Fills packed device batch rows: out[k, :] for k in [0, take_n) gets
// bases||quals||len(le32)||mask of record indices[k].  The caller provides
// a zeroed buffer (rows can be filled incrementally at an offset via the
// out pointer).  out has row stride (2*L + 8).
void fpl_pack_batch(const uint8_t* buf,
                    const int64_t* seq_off, const int64_t* seq_len,
                    const int64_t* qual_off,
                    const int64_t* indices, int64_t take_n,
                    int64_t L, uint8_t* out, int64_t out_rows) {
    const int64_t stride = 2 * L + 8;
    (void)out_rows;
    for (int64_t k = 0; k < take_n; k++) {
        int64_t i = indices[k];
        int64_t sl = seq_len[i];
        if (sl > L) sl = L;
        uint8_t* row = out + k * stride;
        memcpy(row, buf + seq_off[i], (size_t)sl);
        memcpy(row + L, buf + qual_off[i], (size_t)sl);
        uint32_t len32 = (uint32_t)sl;
        memcpy(row + 2 * L, &len32, 4);
        row[2 * L + 4] = 1;
    }
}

// Fills base5-packed device batch rows: out[k, 0:L] gets
// code(base) + 5*(qual-33) per position (padding 255), then len(le32)||mask.
// Row stride is L + 8 — ONE byte per base, decoded on-device; h2d volume
// is a first-order cost on weak links.  Returns 1 on success, 0 if any
// byte is outside the base5 alphabet (A/C/G/T/N, qual 33..83) — the
// caller falls back to the wide layout (partially-written rows are
// discarded by the caller).
int fpl_pack_batch_b5(const uint8_t* buf,
                      const int64_t* seq_off, const int64_t* seq_len,
                      const int64_t* qual_off,
                      const int64_t* indices, int64_t take_n,
                      int64_t L, uint8_t* out, int64_t out_rows) {
    static uint16_t code_tab[256];
    static uint16_t qmul_tab[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; i++) { code_tab[i] = 0x100; qmul_tab[i] = 0x200; }
        code_tab[(unsigned char)'A'] = 0;
        code_tab[(unsigned char)'C'] = 1;
        code_tab[(unsigned char)'G'] = 2;
        code_tab[(unsigned char)'T'] = 3;
        code_tab[(unsigned char)'N'] = 4;
        for (int q = 33; q <= 83; q++) qmul_tab[q] = (uint16_t)(5 * (q - 33));
        init = true;
    }
    const int64_t stride = L + 8;
    (void)out_rows;
    for (int64_t k = 0; k < take_n; k++) {
        int64_t i = indices[k];
        int64_t sl = seq_len[i];
        if (sl > L) sl = L;
        uint8_t* row = out + k * stride;
        const uint8_t* s = buf + seq_off[i];
        const uint8_t* q = buf + qual_off[i];
        uint16_t bad = 0;
        for (int64_t p = 0; p < sl; p++) {
            uint16_t v = code_tab[s[p]] + qmul_tab[q[p]];
            bad |= v;
            row[p] = (uint8_t)v;
        }
        if (bad & 0x300) return 0;
        if (sl < L) memset(row + sl, 255, (size_t)(L - sl));
        uint32_t len32 = (uint32_t)sl;
        memcpy(row + L, &len32, 4);
        row[L + 4] = 1;
        row[L + 5] = row[L + 6] = row[L + 7] = 0;
    }
    return 1;
}

// ---------------------------------------------------------------- emission

// Concatenates src[offs[i] : offs[i]+lens[i]] for all pieces into out.
// The piece tables are computed vectorized in numpy (pipeline/emit.py);
// this is the memcpy loop that materializes the output buffer — the
// native replacement for the reference's per-read string appends
// (src/read.cpp:119-177).
// Piece-table concatenation, two sources: offsets < n1 read src1 (the
// block's original bytes, used in place — no per-block copy of the whole
// input), offsets >= n1 read src2 at (off - n1) (the small aux buffer:
// newlines, tags, N-fill).
void fpl_emit_pieces2(const uint8_t* src1, int64_t n1, const uint8_t* src2,
                      const int64_t* offs, const int64_t* lens, int64_t n,
                      uint8_t* out) {
    int64_t d = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t l = lens[i];
        if (l <= 0) continue;
        int64_t o = offs[i];
        const uint8_t* s = o < n1 ? src1 + o : src2 + (o - n1);
        memcpy(out + d, s, (size_t)l);
        d += l;
    }
}

// ----------------------------------------------------------- decompression

struct libdeflate_decompressor;
libdeflate_decompressor* libdeflate_alloc_decompressor();
void libdeflate_free_decompressor(libdeflate_decompressor*);
// returns: 0 success, 1 bad data, 2 short output, 3 insufficient space
int libdeflate_gzip_decompress_ex(libdeflate_decompressor*,
                                  const void* in, size_t in_n,
                                  void* out, size_t out_cap,
                                  size_t* in_used, size_t* out_used);

static thread_local libdeflate_decompressor* g_decomp = nullptr;

// Decompresses ONE gzip member from `in` (which must contain the complete
// member).  This is the native input path replacing streaming isa-l in the
// reference (src/fastqreader.cpp:79-140): whole-member libdeflate decode is
// ~5x faster than zlib streaming, at the cost of holding the compressed
// file in memory (bounded by FASTPLONG_GZ_INMEM_LIMIT on the Python side).
// Returns the libdeflate status; caller retries with a larger `out` on 3.
int fpl_gzip_decompress_member(const void* in, size_t in_n,
                               void* out, size_t out_cap,
                               size_t* in_used, size_t* out_used) {
    if (!g_decomp) g_decomp = libdeflate_alloc_decompressor();
    if (!g_decomp) return -1;
    return libdeflate_gzip_decompress_ex(g_decomp, in, in_n, out, out_cap,
                                         in_used, out_used);
}

// ------------------------------------------------------------- compression

// Compresses data into one independent gzip member.  Returns compressed
// size, or 0 on failure.  out must have capacity >= fpl_gzip_bound(n).
static thread_local libdeflate_compressor* g_comp = nullptr;
static thread_local int g_level = -1;

size_t fpl_gzip_bound(size_t n, int level) {
    if (!g_comp || g_level != level) {
        if (g_comp) libdeflate_free_compressor(g_comp);
        g_comp = libdeflate_alloc_compressor(level);
        g_level = level;
    }
    if (!g_comp) return 0;
    return libdeflate_gzip_compress_bound(g_comp, n);
}

size_t fpl_gzip_compress(const void* data, size_t n, void* out,
                         size_t out_cap, int level) {
    if (!g_comp || g_level != level) {
        if (g_comp) libdeflate_free_compressor(g_comp);
        g_comp = libdeflate_alloc_compressor(level);
        g_level = level;
    }
    if (!g_comp) return 0;
    return libdeflate_gzip_compress(g_comp, data, n, out, out_cap);
}

// ---------------------------------------------------------------- stats

// Host statRead over packed-batch rows (reference Stats::statRead,
// src/stats.cpp:265-375; numerically identical to the device reduction in
// ops/stats_kernels.stat_batch).  Used by the host-statistics mode, where
// shipping the per-cycle accumulators over a weak device link would cost
// more than recomputing them here at memory speed.
//
// packed row layout: wide (is_b5=0) — bases[0:L], quals[L:2L], stride
// 2L+8; base5 (is_b5=1) — one code+5*(qual-33) byte per base, stride L+8
// (pipeline/batches.py).  Span per row: [lo[i], hi[i]) in read
// coordinates; bases inside
// [mlo[i], mhi[i]) are treated as 'N' (maskRegionWithN semantics) without
// touching qualities.  Cycle c of the span is position lo+c.
//
// Accumulators: cyc[Lacc*18] position-major int64 (per cycle: content[8],
// qual_sum[8], total_base, total_qual — the drain layout of
// pipeline/device.unflatten_side), q20/q30[8] per-base totals, hist[128],
// kmer[1024].  medians[i] gets the span's sorted[n>>1] quality byte.
// Fast path for base5 rows: per base, ONE uint64 add into a per-cycle
// [8]-bucket scratch cell packing (count << 32 | qual_sum) — both fit 32
// bits per call since nrows <= 64K and qv <= 50 — plus one L1-resident
// 2D histogram increment; q20/q30/hist/median all fold from the 2D
// histogram per read, and per-cycle totals fold from the bucket cells
// per call.  The naive loop did ~7 scattered updates per base and ran at
// ~100 MB/s/core; this runs several times faster (bench:
// tools/stat_bench.py).
static void stat_rows_b5(const uint8_t* packed, int64_t nrows,
                         int64_t stride, int64_t L,
                         const int64_t* lo, const int64_t* hi,
                         const int64_t* mlo, const int64_t* mhi,
                         const uint8_t* rowmask, int64_t Lacc,
                         const int8_t* b5code, const uint8_t* b5bucket,
                         const uint8_t* b5qv,
                         int64_t* cyc, int64_t* q20, int64_t* q30,
                         int64_t* hist, int64_t* kmer, uint8_t* medians) {
    static thread_local std::vector<uint64_t> pkbuf;
    int64_t maxc = 0;   // highest cycle touched (bounds memset + fold)
    for (int64_t i = 0; i < nrows; i++) {
        if (rowmask && !rowmask[i]) continue;
        int64_t s = lo ? lo[i] : 0, e = hi[i];
        if (e > L) e = L;
        if (s < 0) s = 0;
        if (e - s > Lacc) e = s + Lacc;
        if (e - s > maxc) maxc = e - s;
    }
    if ((int64_t)pkbuf.size() < maxc * 8) pkbuf.resize(maxc * 8);
    if (maxc) memset(pkbuf.data(), 0, (size_t)(maxc * 8) * 8);
    uint64_t* pk = pkbuf.data();
    const uint64_t kOne = (uint64_t)1 << 32;
    for (int64_t i = 0; i < nrows; i++) {
        medians[i] = 0;
        if (rowmask && !rowmask[i]) continue;
        const uint8_t* b = packed + i * stride;
        int64_t s = lo ? lo[i] : 0, e = hi[i];
        if (e > L) e = L;
        if (s < 0) s = 0;
        if (e - s > Lacc) e = s + Lacc;
        if (e <= s) continue;
        int64_t ms = mlo ? mlo[i] : 0, me = mhi ? mhi[i] : 0;
        if (me > e) me = e;
        if (ms < s) ms = s;
        uint32_t hb[8 * 64];
        memset(hb, 0, sizeof(hb));
        uint32_t key = 0;
        int run = 0;
        // three segments: before / inside / after the N-mask window
        int64_t segs[3][2] = {{s, ms < me ? ms : e},
                              {ms < me ? ms : e, ms < me ? me : e},
                              {ms < me ? me : e, e}};
        for (int sg = 0; sg < 3; sg++) {
            int64_t a = segs[sg][0], z = segs[sg][1];
            if (sg == 1) {
                // masked segment: base forced to 'N' (bucket 6, kmer
                // reset), quality untouched
                for (int64_t p = a; p < z; p++) {
                    uint32_t qv = b5qv[b[p]];
                    pk[(p - s) * 8 + 6] += kOne | qv;
                    hb[6 * 64 + qv]++;
                }
                if (z > a) run = 0;
                continue;
            }
            for (int64_t p = a; p < z; p++) {
                uint8_t raw = b[p];
                uint32_t qv = b5qv[raw];
                uint32_t bu = b5bucket[raw];
                pk[(p - s) * 8 + bu] += kOne | qv;
                hb[bu * 64 + qv]++;
                int8_t cd = b5code[raw];
                if (cd < 0) {
                    run = 0;
                } else {
                    key = ((key << 2) | (uint32_t)cd) & 0x3ff;
                    if (++run >= 5) kmer[key]++;
                }
            }
        }
        // fold the per-read 2D histogram: q20/q30 per-bucket totals, the
        // global base-qual histogram, and this read's median quality
        int64_t n = e - s, want = (n >> 1) + 1, cum = 0;
        int medv = -1;
        uint32_t qcol[64];
        memset(qcol, 0, sizeof(qcol));
        for (int bu = 0; bu < 8; bu++) {
            const uint32_t* row = hb + bu * 64;
            uint32_t c20 = 0, c30 = 0;
            for (int qv = 20; qv < 30; qv++) c20 += row[qv];
            for (int qv = 30; qv < 64; qv++) c30 += row[qv];
            q20[bu] += c20 + c30;
            q30[bu] += c30;
            for (int qv = 0; qv < 64; qv++) qcol[qv] += row[qv];
        }
        for (int qv = 0; qv < 64; qv++) {
            if (!qcol[qv]) continue;
            hist[qv + 33 < 127 ? qv + 33 : 127] += qcol[qv];
            if (medv < 0) {
                cum += qcol[qv];
                if (cum >= want) medv = qv + 33;
            }
        }
        if (medv >= 0) medians[i] = (uint8_t)medv;
    }
    // fold the packed per-cycle cells into the int64 drain layout
    for (int64_t c = 0; c < maxc; c++) {
        int64_t* c18 = cyc + c * 18;
        uint64_t tb = 0, tq = 0;
        for (int bu = 0; bu < 8; bu++) {
            uint64_t v = pk[c * 8 + bu];
            uint64_t cnt = v >> 32, qs = v & 0xffffffffu;
            c18[bu] += (int64_t)cnt;
            c18[8 + bu] += (int64_t)qs;
            tb += cnt;
            tq += qs;
        }
        c18[16] += (int64_t)tb;
        c18[17] += (int64_t)tq;
    }
}

void fpl_stat_rows(const uint8_t* packed, int64_t nrows, int64_t stride,
                   int64_t L, int is_b5,
                   const int64_t* lo, const int64_t* hi,
                   const int64_t* mlo, const int64_t* mhi,
                   const uint8_t* rowmask,
                   int64_t Lacc,
                   int64_t* cyc, int64_t* q20, int64_t* q30,
                   int64_t* hist, int64_t* kmer, uint8_t* medians) {
    static int8_t code[256];
    static uint8_t b5base[256], b5qual[256];
    static int8_t b5code[256];
    static uint8_t b5bucket[256], b5qv[256];
    static bool init = false;
    if (!init) {
        memset(code, -1, sizeof(code));
        code[(unsigned char)'A'] = 0;
        code[(unsigned char)'T'] = 1;
        code[(unsigned char)'U'] = 1;
        code[(unsigned char)'C'] = 2;
        code[(unsigned char)'G'] = 3;
        static const char kB5[5] = {'A', 'C', 'G', 'T', 'N'};
        for (int v = 0; v < 256; v++) {
            if (v == 255) { b5base[v] = 0; b5qual[v] = 0; }
            else {
                b5base[v] = (uint8_t)kB5[v % 5];
                b5qual[v] = (uint8_t)(v / 5 + 33);
            }
            b5code[v] = code[b5base[v]];
            b5bucket[v] = (uint8_t)(b5base[v] & 0x07);
            b5qv[v] = (uint8_t)(b5qual[v] >= 33 ? b5qual[v] - 33 : 0);
        }
        init = true;
    }
    if (is_b5 && nrows <= (int64_t)1 << 31) {
        stat_rows_b5(packed, nrows, stride, L, lo, hi, mlo, mhi, rowmask,
                     Lacc, b5code, b5bucket, b5qv,
                     cyc, q20, q30, hist, kmer, medians);
        return;
    }
    for (int64_t i = 0; i < nrows; i++) {
        medians[i] = 0;
        if (rowmask && !rowmask[i]) continue;
        const uint8_t* b = packed + i * stride;
        const uint8_t* q = b + (is_b5 ? 0 : L);
        int64_t s = lo ? lo[i] : 0;
        int64_t e = hi[i];
        if (e > L) e = L;
        if (s < 0) s = 0;
        if (e - s > Lacc) e = s + Lacc;  // never write past cyc[Lacc*18]
        if (e <= s) continue;
        int64_t ms = mlo ? mlo[i] : 0;
        int64_t me = mhi ? mhi[i] : 0;
        uint32_t qh[256];
        memset(qh, 0, sizeof(qh));
        uint32_t key = 0;
        int run = 0;
        for (int64_t p = s; p < e; p++) {
            uint8_t raw = b[p];
            uint8_t bch = is_b5 ? b5base[raw] : raw;
            uint8_t qch = is_b5 ? b5qual[raw] : q[p];
            uint8_t base = (p >= ms && p < me) ? (uint8_t)'N' : bch;
            int64_t qv = (int64_t)qch - 33;
            int64_t* c18 = cyc + (p - s) * 18;
            int bucket = base & 0x07;
            c18[bucket] += 1;
            c18[8 + bucket] += qv;
            c18[16] += 1;
            c18[17] += qv;
            if (qch >= '5') q20[bucket] += 1;
            if (qch >= '?') q30[bucket] += 1;
            hist[qch < 127 ? qch : 127] += 1;
            qh[qch] += 1;
            int8_t cd = code[base];
            if (cd < 0) {
                run = 0;
            } else {
                key = ((key << 2) | (uint32_t)cd) & 0x3ff;
                if (++run >= 5) kmer[key] += 1;
            }
        }
        // median = sorted[n >> 1] (src/stats.cpp:351-362)
        int64_t n = e - s;
        int64_t want = (n >> 1) + 1;
        int64_t cum = 0;
        for (int v = 0; v < 256; v++) {
            cum += qh[v];
            if (cum >= want) { medians[i] = (uint8_t)v; break; }
        }
    }
}

}  // extern "C"
