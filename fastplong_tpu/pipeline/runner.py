"""Single-file processing pipeline: host IO around the device kernel chain.

Replaces the reference's thread pipeline (1 reader + N workers + writers,
src/seprocessor.cpp:65-172) with:

    host stream-parse -> padded batches -> jitted device step -> host apply

Output records are reconstructed from the ORIGINAL record bytes using the
device-computed spans — bases never round-trip through the device, so
output equality with the reference is structural, not numeric.
"""

import sys

import numpy as np
import jax

from ..common import PASS_FILTER, FAILED_TYPES
from ..io.fastq import FastqStreamReader
from ..io.writer import Writer
from ..stats import Stats
from ..filter_result import FilterResult
from ..util import loginfo
from .batches import make_batches
from .device import build_step

_NL = b"\n"


class BlockResults:
    """Per-record result arrays for one RecordBlock."""

    def __init__(self, n):
        self.lo = np.zeros(n, np.int32)
        self.hi = np.zeros(n, np.int32)
        self.null = np.zeros(n, bool)
        self.code = np.zeros(n, np.int32)
        self.passed = np.zeros(n, bool)

    def scatter(self, indices, out):
        m = indices >= 0
        idx = indices[m]
        self.lo[idx] = out["lo"][m]
        self.hi[idx] = out["hi"][m]
        self.null[idx] = out["null"][m]
        self.code[idx] = out["code"][m]
        self.passed[idx] = out["passed"][m]


class SingleEndRunner:
    def __init__(self, opt):
        self.opt = opt
        self.pre_stats = Stats(is_rna=opt.is_rna)
        self.post_stats = Stats(is_rna=opt.is_rna)
        self.filter_result = FilterResult()
        self.step = build_step(opt)
        self.out_writer = None
        self.failed_writer = None

    # ------------------------------------------------------------------ run

    def run(self):
        opt = self.opt
        if opt.failed_out:
            self.failed_writer = Writer(opt.failed_out, opt.compression,
                                        buffer_size=opt.writer_buffer_size)
        if opt.out or opt.output_to_stdout:
            self.out_writer = Writer(opt.out, opt.compression,
                                     stdout=opt.output_to_stdout,
                                     buffer_size=opt.writer_buffer_size)

        reader = FastqStreamReader(
            "/dev/stdin" if opt.input_from_stdin and not opt.in_file
            else opt.in_file)
        if opt.verbose:
            loginfo("start to load data")

        processed = 0
        last_reported = 0
        while True:
            block = reader.next_block()
            if block is None:
                break
            if opt.reads_to_process > 0:
                remaining = opt.reads_to_process - processed
                if remaining <= 0:
                    break
                if block.n > remaining:
                    block = _truncate_block(block, remaining)
            processed += block.n
            if opt.verbose and processed >= last_reported + 1000000:
                last_reported = processed
                loginfo("loaded %dM reads" % (last_reported // 1000000))
            self._process_block(block)
        reader.close()

        if self.out_writer:
            self.out_writer.close()
        if self.failed_writer:
            self.failed_writer.close()

        self.pre_stats.summarize()
        self.pre_stats.calc_length_histogram()
        self.post_stats.summarize()
        self.post_stats.calc_length_histogram()
        return self.pre_stats, self.post_stats, self.filter_result

    # ---------------------------------------------------------------- block

    def _process_block(self, block):
        res = BlockResults(block.n)
        for batch in make_batches(block):
            out = self.step(jax.numpy.asarray(batch.bases),
                            jax.numpy.asarray(batch.quals),
                            jax.numpy.asarray(batch.lens),
                            jax.numpy.asarray(batch.read_mask))
            out = jax.tree.map(np.asarray, out)
            self._accumulate(out)
            res.scatter(batch.indices, out)
        self._emit(block, res)

    def _accumulate(self, out):
        self.pre_stats.add_batch(out["pre"])
        self.post_stats.add_batch(out["post"])
        live = ~out["null"]
        codes = out["code"][live]
        if len(codes):
            self.filter_result.add_filter_results(codes)
        poly = out["poly"]
        pm = live & (poly >= 0)
        if pm.any():
            for b in range(4):
                sel = pm & (poly == b)
                if sel.any():
                    self.filter_result.add_polyx_trimmed(
                        b, int(out["poly_trim"][sel].sum()), int(sel.sum()))

    def _emit(self, block, res):
        out_pieces = []
        failed_pieces = []
        buf = block.buf
        name_off, name_len = block.name_off, block.name_len
        seq_off = block.seq_off
        strand_off, strand_len = block.strand_off, block.strand_len
        qual_off = block.qual_off
        write_failed = self.failed_writer is not None
        write_out = self.out_writer is not None
        for i in range(block.n):
            if res.null[i]:
                continue  # trimAndCut returned NULL: the read vanishes
            if res.passed[i]:
                if not write_out:
                    continue
                lo = res.lo[i]
                hi = res.hi[i]
                so = seq_off[i]
                qo = qual_off[i]
                out_pieces += (
                    buf[name_off[i]:name_off[i] + name_len[i]], _NL,
                    buf[so + lo:so + hi], _NL,
                    buf[strand_off[i]:strand_off[i] + strand_len[i]], _NL,
                    buf[qo + lo:qo + hi], _NL)
            elif write_failed:
                # The reference trims or1 IN PLACE (trimAndCut/polyX mutate
                # the same Read object), so failed_out records carry the
                # trimmed read + failure tag (seprocessor.cpp:278-279).
                lo = res.lo[i]
                hi = res.hi[i]
                so = seq_off[i]
                qo = qual_off[i]
                failed_pieces += (
                    buf[name_off[i]:name_off[i] + name_len[i]],
                    b" ", FAILED_TYPES[res.code[i]].encode(), _NL,
                    buf[so + lo:so + hi], _NL,
                    buf[strand_off[i]:strand_off[i] + strand_len[i]], _NL,
                    buf[qo + lo:qo + hi], _NL)
        if out_pieces and write_out:
            self.out_writer.write(b"".join(out_pieces))
        if failed_pieces:
            self.failed_writer.write(b"".join(failed_pieces))


def _truncate_block(block, n):
    from ..io.fastq import RecordBlock
    return RecordBlock(
        block.buf, block.arr,
        block.name_off[:n], block.name_len[:n],
        block.seq_off[:n], block.seq_len[:n],
        block.strand_off[:n], block.strand_len[:n],
        block.qual_off[:n], first_index=block.first_index)
