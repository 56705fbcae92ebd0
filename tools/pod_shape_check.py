"""4-process x 2-local-device pod-shape equivalence check (two-level
(dcn,ici) mesh with dcn = process boundary + unique-compact exchange)
against the single-process 8-device run, loss-for-loss. Too slow for the
CI suite (4 coordinated subprocesses on CPU); run standalone:
    python tools/pod_shape_check.py
"""
import os, re, subprocess, sys, threading
import os.path as _osp
REPO = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
FLAGS = ["--dataset","synthetic","--synthetic_rows","8192",
 "--synthetic_fields","4","--synthetic_vocab","20000",
 "--embedding_dim","8","--mini_batch_size","128",
 "--test_mini_batch_size","1024","--nepochs","1","--print_freq","16",
 "--test_freq","0","--compress_method","cafe","--compress_rate","0.05",
 "--cafe_sketch_threshold","5","--shard_embeddings","true",
 "--force_platform","cpu","--mesh_inner","2","--shard_unique_frac","0.5"]
LOSS_RE = re.compile(r"it (\d+)/\d+ .*?, ([0-9.]+) ms/it, loss ([0-9.]+)")
def run(extra, ndev):
    env = {k:v for k,v in os.environ.items() if k not in ("XLA_FLAGS","JAX_PLATFORMS","PYTHONPATH")}
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    return subprocess.Popen([sys.executable, os.path.join(REPO,"main.py")]+FLAGS+extra,
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
procs = [run(["--dist_num_processes","4","--dist_process_id",str(i),
              "--dist_coordinator","localhost:12411"], 2) for i in range(4)]
# drain every pipe CONCURRENTLY: the 4 processes are collectively
# synchronized, so reading them one-by-one can deadlock once any writer
# fills its ~64KB pipe buffer; and kill all children on any failure so a
# re-run doesn't find the coordinator port held by orphans.
outs = [None] * 4
def _drain(i, p):
    outs[i] = p.communicate()[0]
threads = [threading.Thread(target=_drain, args=(i, p), daemon=True)
           for i, p in enumerate(procs)]
try:
    for t in threads: t.start()
    for t in threads: t.join(timeout=1500)
    if any(t.is_alive() for t in threads):
        raise TimeoutError("4-process run exceeded 1500s")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
finally:
    for p in procs:
        if p.poll() is None:
            p.kill()
ref = run([], 8)
ref_out,_ = ref.communicate(timeout=900)
assert ref.returncode == 0, ref_out[-3000:]
def losses(o): return {int(m.group(1)): float(m.group(3)) for m in LOSS_RE.finditer(o)}
ls = [losses(o) for o in outs]; lr = losses(ref_out)
assert ls[0] and all(l.keys()==lr.keys() for l in ls)
for it in lr:
    for l in ls[1:]:
        assert abs(l[it]-ls[0][it]) < 1e-6
    assert abs(ls[0][it]-lr[it]) < max(2e-3, 2e-3*lr[it]), (it, ls[0][it], lr[it])
print("4-process x 2-device (mesh_inner 2, unique-compact) == single-process 8-device: OK")
print("iters checked:", sorted(lr))
