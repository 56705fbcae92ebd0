"""Multi-host execution: 2 processes x 4 virtual CPU devices = one
8-device global mesh, each process feeding its slice of every batch.

The same training config runs (a) as two coordinated processes and
(b) as one process with 8 devices; the global SPMD program is identical,
so the loss trajectories and eval metrics must agree to fp noise.

Reference: none — the reference has no distributed execution
(SURVEY.md §2.6); spec from BASELINE.md's 1-chip/1-host/N-hosts ladder.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "--dataset", "synthetic", "--synthetic_rows", "8192",
    "--synthetic_fields", "4", "--synthetic_vocab", "20000",
    "--embedding_dim", "8", "--mini_batch_size", "128",
    "--test_mini_batch_size", "1024",
    "--nepochs", "1", "--print_freq", "16", "--test_freq", "48",
    "--compress_method", "cafe", "--compress_rate", "0.05",
    "--cafe_sketch_threshold", "5", "--shard_embeddings", "true",
    "--force_platform", "cpu",
]

LOSS_RE = re.compile(r"it (\d+)/\d+ .*?, ([0-9.]+) ms/it, loss ([0-9.]+)")
AUC_RE = re.compile(r"auc ([0-9.]+) %")


def _run(extra, n_local_devices, flags=None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "main.py")]
        + (FLAGS if flags is None else flags) + extra,
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)


def _launch_pair(port, extra, flags=None, timeout=600):
    """Two coordinated processes; returns their stdouts, asserting rc 0."""
    procs = [_run(["--dist_num_processes", "2", "--dist_process_id",
                   str(i), "--dist_coordinator", port] + extra, 4,
                  flags=flags)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    return outs


def _losses(out):
    return {int(m.group(1)): float(m.group(3))
            for m in LOSS_RE.finditer(out)}


@pytest.mark.timeout(900)
def test_two_process_mesh_matches_single_process():
    outs = _launch_pair("localhost:12401", [])
    ref = _run([], 8)
    ref_out, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, ref_out[-3000:]

    l0, l1, lr = _losses(outs[0]), _losses(outs[1]), _losses(ref_out)
    assert l0 and l0.keys() == l1.keys() == lr.keys()
    for it in lr:
        # both processes print the same replicated loss
        assert l0[it] == pytest.approx(l1[it], abs=1e-6)
        # and it matches the single-process 8-device run to fp noise
        assert l0[it] == pytest.approx(lr[it], rel=2e-3, abs=2e-3), \
            f"iter {it}: 2-proc {l0[it]} vs single {lr[it]}"

    a0 = AUC_RE.search(outs[0])
    ar = AUC_RE.search(ref_out)
    assert a0 and ar, "eval line missing"
    assert float(a0.group(1)) == pytest.approx(float(ar.group(1)),
                                               abs=0.5)


@pytest.mark.timeout(900)
def test_two_process_two_level_mesh_matches_single_process():
    """The pod deployment shape: 2 processes x 4 local devices with
    --mesh_inner 4 — the 'dcn' axis IS the process boundary, 'ici' the
    local chips — plus the unique-compact hierarchical exchange. Must
    match the single-process 2x4 run loss-for-loss."""
    extra = ["--mesh_inner", "4", "--shard_unique_frac", "0.5"]
    outs = _launch_pair("localhost:12405", extra)
    ref = _run(extra, 8)
    ref_out, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, ref_out[-3000:]
    l0, l1, lr = _losses(outs[0]), _losses(outs[1]), _losses(ref_out)
    assert l0 and l0.keys() == l1.keys() == lr.keys()
    for it in lr:
        assert l0[it] == pytest.approx(l1[it], abs=1e-6)
        assert l0[it] == pytest.approx(lr[it], rel=2e-3, abs=2e-3), \
            f"iter {it}: 2-proc {l0[it]} vs single {lr[it]}"


@pytest.mark.timeout(600)
def test_two_process_dp_only_builds_mesh():
    """Multi-process WITHOUT --shard_embeddings must still build the
    global mesh for per-process feeding (review finding: it crashed in
    NamedSharding(None, ...))."""
    flags = [f if f != "true" else "false" for f in FLAGS]  # shard off
    for out in _launch_pair("localhost:12402", [], flags=flags,
                            timeout=480):
        assert _losses(out), "no training output"


@pytest.mark.timeout(900)
def test_two_process_checkpoint_resume(tmp_path):
    """Multi-host orbax checkpointing: a 2-process run saves (all
    processes participate), a fresh 2-process run resumes from it and
    continues with the exact next-batch losses."""
    ck = str(tmp_path / "mh_ck")

    # run A: full run, rolling checkpoint every 16 iters
    outs_a = _launch_pair("localhost:12403",
                          ["--save_model", ck, "--save_freq", "16"])
    ref = _losses(outs_a[0])
    assert os.path.islink(ck + ".latest")
    # run B: the .latest slot is the END-of-run save (nothing left to
    # train); resume from the OTHER slot — one rolling save earlier,
    # mid-stream — to exercise a true multi-host restore + continue
    target = os.path.realpath(ck + ".latest")
    other = ck + (".rb" if target.endswith(".ra") else ".ra")
    outs_b = _launch_pair("localhost:12404", ["--load_model", other])
    res = _losses(outs_b[0])
    assert "loaded" in outs_b[0]
    # the resumed run reports the SAME losses at the iters it covers
    common = sorted(set(ref) & set(res))
    assert common, f"no overlapping loss iters: {sorted(res)[:4]}"
    for it in common:
        assert res[it] == pytest.approx(ref[it], abs=2e-3), \
            f"iter {it}: resumed {res[it]} vs original {ref[it]}"
