"""Golden parity for remaining surfaces: RNA input, --reads_to_process,
gzip output (content equality), report title, thread counts."""

import gzip
import os

import numpy as np
import pytest

from golden_util import (write_random_fastq, assert_parity, run_reference,
                         run_ours, strip_command)


def write_rna_fastq(path, n_reads=200, seed=77):
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_reads):
            n = int(rng.integers(40, 300))
            seq = "".join(rng.choice(list("ACGU"), size=n))
            qual = "".join(chr(int(q))
                           for q in rng.integers(33 + 3, 33 + 40, size=n))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    return path


def test_rna_input(tmp_path):
    fq = write_rna_fastq(str(tmp_path / "rna.fq"))
    assert_parity(fq, str(tmp_path), ["-A", "-w", "1"], check_html=True)


def test_reads_to_process(tmp_path):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300, seed=88)
    assert_parity(fq, str(tmp_path), ["-A", "--reads_to_process", "57"])


def test_report_title(tmp_path):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=60, seed=89)
    assert_parity(fq, str(tmp_path),
                  ["-A", "-R", "my custom title", "-w", "1"],
                  check_html=True)


def test_gzip_output_content(tmp_path):
    """Compressed outputs decompress to identical bytes (member boundaries
    depend on internal buffering and may differ)."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=250, seed=90)
    ref_out, ref_failed, ref_json, _ = run_reference(
        fq, str(tmp_path), ["-A"])
    # rerun with .gz outputs
    import subprocess
    from golden_util import ensure_reference, ref_env
    ref = ensure_reference()
    r = subprocess.run(
        [ref, "-i", fq, "-o", str(tmp_path / "ref.fq.gz"),
         "-j", str(tmp_path / "r2.json"), "-h", str(tmp_path / "r2.html"),
         "-A", "-z", "6"], capture_output=True, timeout=300,
        env=ref_env())
    assert r.returncode == 0
    from fastplong_tpu.main import main
    main(["fastplong", "-i", fq, "-o", str(tmp_path / "my.fq.gz"),
          "-j", str(tmp_path / "m2.json"), "-h", str(tmp_path / "m2.html"),
          "-A", "-z", "6"])
    a = gzip.decompress(open(tmp_path / "ref.fq.gz", "rb").read())
    b = gzip.decompress(open(tmp_path / "my.fq.gz", "rb").read())
    assert a == b


def test_gzip_input(tmp_path):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=250, seed=91)
    gz = str(tmp_path / "in.fq.gz")
    with open(fq, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        f_out.write(f_in.read())
    assert_parity(gz, str(tmp_path), ["-A"])


def test_thread_flag_stats_invariant(tmp_path):
    """Stats/JSON must not depend on -w (they don't in either impl)."""
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=200, seed=92)
    assert_parity(fq, str(tmp_path), ["-A", "-w", "8"])


def test_empty_input(tmp_path):
    fq = str(tmp_path / "empty.fq")
    open(fq, "w").close()
    assert_parity(fq, str(tmp_path), ["-A"])


def test_zero_length_reads(tmp_path):
    fq = str(tmp_path / "in.fq")
    with open(fq, "w") as f:
        f.write("@r0\n\n+\n\n@r1\nACGTACGTACGTACGTACGTACGT\n+\n"
                "IIIIIIIIIIIIIIIIIIIIIIII\n@r2\n\n+\n\n")
    assert_parity(fq, str(tmp_path), ["-A"])
    assert_parity(fq, str(tmp_path), ["-A", "-5", "-3"])


def test_fasta_adapter_with_n(tmp_path):
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=150, seed=93,
                            adapter_start="AGATCGGAAGAGCACACG",
                            adapter_prob=0.5)
    fa = tmp_path / "a.fa"
    fa.write_text(">iupac\nAGATCGGANGAGCACACG\n")
    # explicit -s/-e so auto-detection is skipped; FASTA adapters (with an
    # IUPAC N) trim on top of them (trimByMultiSequences)
    assert_parity(fq, str(tmp_path),
                  ["-s", "AGATCGGAAGAGCACACG", "-a", str(fa)])


def test_dont_overwrite_stderr_parity(tmp_path):
    """--dont_overwrite must refuse with the reference's exact diagnostic
    (options.cpp:92-112) and a nonzero exit."""
    import subprocess
    import sys
    from golden_util import ensure_reference, ref_env
    ref = ensure_reference()
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=20,
                            min_len=40, max_len=120, seed=3)
    out = str(tmp_path / "exists.fq")
    open(out, "w").write("")
    args = ["-i", fq, "-o", out, "--dont_overwrite", "-A",
            "-j", str(tmp_path / "r.json"), "-h", str(tmp_path / "r.html")]
    r_ref = subprocess.run([ref] + args, capture_output=True, timeout=60,
                           env=ref_env())
    r_our = subprocess.run(
        [sys.executable, "-m", "fastplong_tpu.main"] + args,
        capture_output=True, timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r_ref.returncode != 0 and r_our.returncode != 0
    want = [ln for ln in r_ref.stderr.decode().splitlines()
            if "already exists" in ln]
    got = [ln for ln in r_our.stderr.decode().splitlines()
           if "already exists" in ln]
    assert want and want == got, (want, got)


def test_worker_config_pins_byte_parity(tmp_path):
    """The daemon pool worker's config pins (pinned 2-bucket ladder +
    whole-rows ring slices, daemon._Worker.ENV) must be byte-invariant:
    bucket choice and drain slicing are pure execution geometry.  Runs
    the CLI in a subprocess so the import-time FASTPLONG_BUCKETS pin
    takes effect."""
    import subprocess
    import sys
    fq = write_random_fastq(str(tmp_path / "in.fq"), n_reads=300,
                            min_len=30, max_len=900, seed=91,
                            adapter_start="AATGTACTTCGTTCAGTTACGTATTGCT",
                            adapter_prob=0.5)
    extra = ["-s", "AATGTACTTCGTTCAGTTACGTATTGCT", "-x", "-5"]
    ref_out, ref_failed, ref_json, _ = run_reference(
        fq, str(tmp_path), extra)
    env = dict(os.environ)
    env["FASTPLONG_BUCKETS"] = "2048,16384"
    env["FASTPLONG_FETCH_FULL_RING"] = "1"
    env["FASTPLONG_STREAM_FEED"] = "0"
    env["FASTPLONG_TRIM_PARTIALS"] = "0"
    env.pop("FASTPLONG_DAEMON", None)
    my_out = str(tmp_path / "w_out.fq")
    my_failed = str(tmp_path / "w_failed.fq")
    my_json = str(tmp_path / "w.json")
    r = subprocess.run(
        [sys.executable, "-m", "fastplong_tpu.main", "-i", fq,
         "-o", my_out, "--failed_out", my_failed, "-j", my_json,
         "-h", str(tmp_path / "w.html")] + extra,
        capture_output=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert open(ref_out, "rb").read() == open(my_out, "rb").read()
    assert open(ref_failed, "rb").read() == open(my_failed, "rb").read()
    assert (strip_command(open(ref_json).read())
            == strip_command(open(my_json).read()))
