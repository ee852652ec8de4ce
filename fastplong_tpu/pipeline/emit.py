"""Vectorized record emission.

The reference serializes each surviving read with per-read string appends
(src/read.cpp:119-177, appendToString/appendToStringWithTag).  A per-read
Python loop caps the host pipeline at ~0.1-0.2M records/s, so this module
builds the whole output buffer for a RecordBlock at once:

  numpy computes a PIECE TABLE — (src_offset, length) pairs into one source
  buffer (the block's original bytes + a small aux buffer holding newlines,
  name tags and N-fill) — and a native two-source memcpy loop (fpl_emit_pieces2) or a
  single numpy gather materializes the bytes.

Byte-for-byte identical to the per-read path in runner.SingleEndRunner
(kept for split mode), which the golden tests pin against the reference.
"""

import numpy as np

from ..common import FAILED_TYPES
from .device import TAG_NONE, TAG_SPLIT_LEFT, TAG_SPLIT_RIGHT

# ---------------------------------------------------------------- static aux
# aux buffer prefix shared by every block: newline, split tags, failure tags
_parts = [b"\n"]
_off = 1
_TAG_OFF = {TAG_NONE: (0, 0)}
for _tag, _s in ((TAG_SPLIT_LEFT, b"split-by-adapter-left-"),
                 (TAG_SPLIT_RIGHT, b"split-by-adapter-right-")):
    _TAG_OFF[_tag] = (_off, len(_s))
    _parts.append(_s)
    _off += len(_s)
# " <failure-tag>\n" composites indexed by filter code
_FAIL_OFF = np.zeros(len(FAILED_TYPES), np.int64)
_FAIL_LEN = np.zeros(len(FAILED_TYPES), np.int64)
for _code, _name in enumerate(FAILED_TYPES):
    if _name:
        _s = b" " + _name.encode() + b"\n"
        _FAIL_OFF[_code] = _off
        _FAIL_LEN[_code] = len(_s)
        _parts.append(_s)
        _off += len(_s)
_AUX_STATIC = b"".join(_parts)
_NL_OFF = 0

_TAG_OFF_ARR = np.zeros(3, np.int64)
_TAG_LEN_ARR = np.zeros(3, np.int64)
for _tag, (_o, _l) in _TAG_OFF.items():
    _TAG_OFF_ARR[_tag] = _o
    _TAG_LEN_ARR[_tag] = _l


def _emit_pieces(src1, aux, offs, lens):
    """Concatenate pieces from two sources: offsets < len(src1) read the
    block's original bytes IN PLACE, offsets beyond read the small aux
    buffer — no per-block copy of the whole input (C fast path, numpy
    gather fallback)."""
    flat_offs = offs.ravel()
    flat_lens = lens.ravel()
    total = int(flat_lens.sum())
    if total == 0:
        return b""
    try:
        from ..native import emit_pieces2 as native_emit
    except Exception:
        native_emit = None
    if native_emit is not None:
        out = native_emit(src1, aux, flat_offs, flat_lens, total)
        if out is not None:
            return out
    src = np.concatenate([src1, np.frombuffer(aux, np.uint8)])
    dest0 = np.concatenate(([0], np.cumsum(flat_lens)[:-1]))
    idx = np.repeat(flat_offs - dest0, flat_lens) + np.arange(total,
                                                              dtype=np.int64)
    return src[idx].tobytes()


def _mask_spans(lo, hi, m_lo, m_hi, masked):
    """Split [lo,hi) into (A-end, fill, B-start) under an N-mask span,
    mirroring runner._seq_pieces / maskRegionWithN (read.cpp:217-225)."""
    a = np.maximum(lo, m_lo)
    b = np.minimum(hi, m_hi)
    valid = masked & (m_hi > m_lo) & (b > a)
    a = np.where(valid, a, hi)
    fill = np.where(valid, b - a, 0)
    b = np.where(valid, b, hi)
    return a, fill, b


def emit_block_fast(block, res, cap, mask_on, write_out, write_failed,
                    return_read_lens=False):
    """Returns (out_bytes, failed_bytes) for one completed RecordBlock —
    or (out_bytes, failed_bytes, read_lens) with return_read_lens, where
    read_lens[i] is record i's byte length within out_bytes (split mode
    slices the buffer at pack boundaries, pipeline/split.py).

    Mirrors the reference's emission semantics: passed out-reads are written
    with composed name tags ('@' + 'rN-' + split-tag + rest,
    read.cpp:200,209,244,256); failed reads are written once per record
    (only when the record produced a single out-read) as the in-place
    trimmed PARENT read plus a failure tag (seprocessor.cpp:278-279).
    """
    live = ~res.null[:, None]
    base = len(block.arr)

    region_vals = None
    aux_dyn = []
    dyn_off = base + len(_AUX_STATIC)

    out_sel = None
    if write_out:
        out_sel = res.active & res.passed & live
    fail_sel = None
    if write_failed:
        fail_sel = (res.active & ~res.passed & live
                    & (res.n_out[:, None] == 1))

    # dynamic aux: "rN-" strings for the region numbers present + N fill
    reg_off = reg_len = None
    if out_sel is not None and out_sel.any():
        regs = res.region_no[out_sel]
        pos = regs[regs > 0]
        if pos.size:
            region_vals = np.unique(pos)
            reg_off = np.zeros(len(region_vals), np.int64)
            reg_len = np.zeros(len(region_vals), np.int64)
            for k, v in enumerate(region_vals.tolist()):
                s = b"r%d-" % v
                reg_off[k] = dyn_off
                reg_len[k] = len(s)
                aux_dyn.append(s)
                dyn_off += len(s)

    max_fill = 0
    if mask_on:
        if out_sel is not None and out_sel.any():
            d = (np.minimum(res.out_hi, res.mask_hi)
                 - np.maximum(res.out_lo, res.mask_lo))[out_sel]
            max_fill = max(max_fill, int(np.maximum(d, 0).max()))
        if fail_sel is not None and fail_sel.any():
            d = np.where(res.is_parent,
                         np.minimum(res.hi[:, None], res.mask_hi)
                         - np.maximum(res.lo[:, None], res.mask_lo),
                         0)[fail_sel]
            max_fill = max(max_fill, int(np.maximum(d, 0).max()))
    n_off = dyn_off
    if max_fill:
        aux_dyn.append(b"N" * max_fill)

    aux = _AUX_STATIC + b"".join(aux_dyn)

    out_bytes = b""
    read_lens = (np.zeros(block.n, np.int64) if return_read_lens else None)
    if out_sel is not None and out_sel.any():
        ii, cc = np.nonzero(out_sel)
        lo = res.out_lo[ii, cc].astype(np.int64)
        hi = res.out_hi[ii, cc].astype(np.int64)
        so = block.seq_off[ii]
        qo = block.qual_off[ii]
        no = block.name_off[ii]
        nl = block.name_len[ii]
        tag = res.out_tag[ii, cc]
        reg = res.region_no[ii, cc]
        nl_o = np.full(len(ii), base + _NL_OFF, np.int64)
        nl_l = np.ones(len(ii), np.int64)
        # rN- pieces
        if region_vals is not None:
            kidx = np.searchsorted(region_vals, reg)
            has_reg = reg > 0
            r_off = np.where(has_reg, reg_off[np.minimum(kidx,
                                                         len(region_vals) - 1)],
                             0)
            r_len = np.where(has_reg, reg_len[np.minimum(kidx,
                                                         len(region_vals) - 1)],
                             0)
        else:
            r_off = np.zeros(len(ii), np.int64)
            r_len = np.zeros(len(ii), np.int64)
        t_off = base + _TAG_OFF_ARR[tag]
        t_len = _TAG_LEN_ARR[tag]
        if mask_on:
            m_lo = res.mask_lo[ii, cc].astype(np.int64)
            m_hi = res.mask_hi[ii, cc].astype(np.int64)
            a, fill, b = _mask_spans(lo, hi, m_lo, m_hi,
                                     np.ones(len(ii), bool))
        else:
            a, fill, b = hi, np.zeros(len(ii), np.int64), hi
        offs = np.stack([
            no,                      # '@'
            r_off,                   # rN-
            t_off,                   # split tag
            no + 1,                  # rest of name
            nl_o,                    # \n
            so + lo,                 # seq A
            np.full(len(ii), n_off, np.int64),  # N fill
            so + b,                  # seq B
            nl_o,                    # \n
            block.strand_off[ii],    # strand
            nl_o,                    # \n
            qo + lo,                 # qual
            nl_o,                    # \n
        ], axis=1)
        lens = np.stack([
            np.ones(len(ii), np.int64),
            r_len,
            t_len,
            nl - 1,
            nl_l,
            a - lo,
            fill,
            hi - b,
            nl_l,
            block.strand_len[ii],
            nl_l,
            hi - lo,
            nl_l,
        ], axis=1)
        out_bytes = _emit_pieces(block.arr, aux, offs, lens)
        if return_read_lens:
            # np.nonzero is row-major, so rows are grouped by record in
            # input order — per-record byte lengths are a segment sum
            np.add.at(read_lens, ii, lens.sum(axis=1))

    failed_bytes = b""
    if fail_sel is not None and fail_sel.any():
        ii, cc = np.nonzero(fail_sel)
        lo = res.lo[ii].astype(np.int64)
        hi = res.hi[ii].astype(np.int64)
        so = block.seq_off[ii]
        qo = block.qual_off[ii]
        no = block.name_off[ii]
        nl = block.name_len[ii]
        code = res.code[ii, cc]
        nl_o = np.full(len(ii), base + _NL_OFF, np.int64)
        nl_l = np.ones(len(ii), np.int64)
        if mask_on:
            # the parent read was N-masked in place only when the single
            # out-read IS the parent (runner._emit failed branch)
            m_lo = res.mask_lo[ii, cc].astype(np.int64)
            m_hi = res.mask_hi[ii, cc].astype(np.int64)
            a, fill, b = _mask_spans(lo, hi, m_lo, m_hi,
                                     res.is_parent[ii, cc])
        else:
            a, fill, b = hi, np.zeros(len(ii), np.int64), hi
        offs = np.stack([
            no,                                 # full name
            base + _FAIL_OFF[code],             # " tag\n"
            so + lo,                            # seq A
            np.full(len(ii), n_off, np.int64),  # N fill
            so + b,                             # seq B
            nl_o,
            block.strand_off[ii],
            nl_o,
            qo + lo,
            nl_o,
        ], axis=1)
        lens = np.stack([
            nl,
            _FAIL_LEN[code],
            a - lo,
            fill,
            hi - b,
            nl_l,
            block.strand_len[ii],
            nl_l,
            hi - lo,
            nl_l,
        ], axis=1)
        failed_bytes = _emit_pieces(block.arr, aux, offs, lens)

    if return_read_lens:
        return out_bytes, failed_bytes, read_lens
    return out_bytes, failed_bytes
