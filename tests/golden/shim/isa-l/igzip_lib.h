// Minimal isa-l igzip API stand-in backed by zlib, used ONLY to build the
// reference fastplong binary for golden-output tests on machines without
// libisal.  Original code; implements the subset used by the reference
// FastqReader (src/fastqreader.cpp:79-176): streaming raw-deflate inflate
// with explicit gzip header parsing and multi-member reset.
#pragma once

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <zlib.h>

#define ISAL_DECOMP_OK 0
#define ISAL_END_INPUT 1
#define ISAL_BLOCK_FINISH 4
#define ISAL_GZIP_NO_HDR_VER 3

struct isal_gzip_header {
  int dummy;
};

struct inflate_state {
  uint8_t* next_in;
  uint32_t avail_in;
  uint8_t* next_out;
  uint32_t avail_out;
  int block_state;
  int bfinal;
  int crc_flag;
  // internal
  z_stream zs;
  int zs_live;
  int hdr_done;
};

inline void isal_gzip_header_init(isal_gzip_header* h) { h->dummy = 0; }

inline void isal_inflate_init(inflate_state* s) {
  std::memset(&s->zs, 0, sizeof(s->zs));
  s->zs_live = 0;
  s->hdr_done = 0;
  s->block_state = 0;
  s->bfinal = 0;
  s->next_in = nullptr;
  s->avail_in = 0;
  s->next_out = nullptr;
  s->avail_out = 0;
}

inline void isal_inflate_reset(inflate_state* s) {
  if (s->zs_live) {
    inflateEnd(&s->zs);
    s->zs_live = 0;
  }
  std::memset(&s->zs, 0, sizeof(s->zs));
  s->hdr_done = 0;
  s->block_state = 0;
  s->bfinal = 0;
}

// Parses the gzip member header from (next_in, avail_in), consuming it.
inline int isal_read_gzip_header(inflate_state* s, isal_gzip_header*) {
  uint8_t* p = s->next_in;
  uint32_t n = s->avail_in;
  if (n < 10 || p[0] != 0x1f || p[1] != 0x8b || p[2] != 8) return -1;
  uint8_t flg = p[3];
  uint32_t off = 10;
  if (flg & 0x04) {  // FEXTRA
    if (off + 2 > n) return -1;
    uint32_t xlen = p[off] | (p[off + 1] << 8);
    off += 2 + xlen;
  }
  if (flg & 0x08) {  // FNAME
    while (off < n && p[off]) off++;
    off++;
  }
  if (flg & 0x10) {  // FCOMMENT
    while (off < n && p[off]) off++;
    off++;
  }
  if (flg & 0x02) off += 2;  // FHCRC
  if (off > n) return -1;
  s->next_in += off;
  s->avail_in -= off;
  s->hdr_done = 1;
  return ISAL_DECOMP_OK;
}

// Streaming raw-deflate inflate; sets block_state=ISAL_BLOCK_FINISH and
// consumes the 8-byte gzip trailer when a member ends.
inline int isal_inflate(inflate_state* s) {
  if (s->block_state == ISAL_BLOCK_FINISH) return ISAL_DECOMP_OK;
  if (!s->zs_live) {
    std::memset(&s->zs, 0, sizeof(s->zs));
    if (inflateInit2(&s->zs, -15) != Z_OK) return -1;
    s->zs_live = 1;
  }
  s->zs.next_in = s->next_in;
  s->zs.avail_in = s->avail_in;
  s->zs.next_out = s->next_out;
  s->zs.avail_out = s->avail_out;
  int ret = inflate(&s->zs, Z_NO_FLUSH);
  s->next_in = s->zs.next_in;
  s->avail_in = s->zs.avail_in;
  s->next_out = s->zs.next_out;
  s->avail_out = s->zs.avail_out;
  if (ret == Z_STREAM_END) {
    s->block_state = ISAL_BLOCK_FINISH;
    s->bfinal = 1;
    inflateEnd(&s->zs);
    s->zs_live = 0;
    // consume the member trailer (crc32 + isize) if present in the buffer
    uint32_t skip = s->avail_in < 8 ? s->avail_in : 8;
    s->next_in += skip;
    s->avail_in -= skip;
  } else if (ret != Z_OK && ret != Z_BUF_ERROR) {
    return -1;
  }
  return ISAL_DECOMP_OK;
}
