#!/usr/bin/env python
"""Graph-recommender training driver: LightGCN and PinSAGE with optional
CAFE-compressed node embeddings.

Mirrors the reference's TOIS_revision drivers:
  * LightGCN (code/main.py + Procedure.py): per-epoch BPR training over
    C-sampled (user, pos, neg) triples, recall@k evaluation on the held-out
    interactions, gowalla-style train.txt/test.txt input ("user i1 i2 ...").
  * PinSAGE (model.py:96-193): margin-loss training on random-walk item
    pairs, per-epoch checkpointing that INCLUDES the sketch state
    (save_state/load_state parity, PinSAGE/sketch.cpp:333-402) and
    auto-resume from the latest checkpoint (model.py:135-147).

With no --data_path a synthetic bipartite graph with latent block structure
is generated so recall@k is meaningfully above random.
"""

import argparse
import glob
import json
import os
import os.path as osp
import re
import time

import numpy as np


def load_gowalla_txt(path):
    """LightGCN dataset format: each line 'user item item ...'."""
    user_items = []
    n_items = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            u = int(parts[0])
            its = np.array([int(x) for x in parts[1:]], dtype=np.int32)
            while len(user_items) <= u:
                user_items.append(np.empty(0, np.int32))
            user_items[u] = its
            if its.size:
                n_items = max(n_items, int(its.max()) + 1)
    return user_items, n_items


def make_synthetic_interactions(n_users=600, n_items=1200, blocks=8,
                                per_user=24, seed=0):
    """Block-structured bipartite graph: users prefer their block's items
    (the latent structure recall@k can recover)."""
    rng = np.random.default_rng(seed)
    train, test = [], []
    for u in range(n_users):
        b = u % blocks
        lo, hi = b * n_items // blocks, (b + 1) * n_items // blocks
        k = per_user
        own = rng.choice(np.arange(lo, hi), size=min(k * 3 // 4, hi - lo),
                         replace=False)
        other = rng.integers(0, n_items, k - len(own))
        its = np.unique(np.concatenate([own, other])).astype(np.int32)
        rng.shuffle(its)
        cut = max(len(its) * 4 // 5, 1)
        train.append(np.sort(its[:cut]))
        test.append(np.sort(its[cut:]))
    return train, test, n_items


def save_state(path, state, extra):
    import orbax.checkpoint as ocp
    path = osp.abspath(path)
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as c:
        c.save(path, state, force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(extra, f)


def load_state(path, state):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as c:
        st = c.restore(osp.abspath(path), state)
    extra = {}
    if osp.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return st, extra


def latest_epoch_ckpt(save_dir, model):
    """Auto-resume convention (PinSAGE model.py:135-141): pick the highest
    model_epoch_*.ckpt in save_dir."""
    best, best_ep = None, -1
    for p in glob.glob(osp.join(save_dir, f"{model}_epoch_*.ckpt")):
        m = re.search(r"_epoch_(\d+)\.ckpt$", p)
        if m and int(m.group(1)) > best_ep:
            best, best_ep = p, int(m.group(1))
    return best, best_ep


def run_lightgcn(args, train_pos, test_pos, n_items):
    import jax.numpy as jnp
    from cafe_tpu.models.graphrec.lightgcn import (
        LightGCN, LightGCNConfig, build_bipartite_graph)
    from cafe_tpu.models.graphrec.sampling import sample_negative

    n_users = len(train_pos)
    users = np.concatenate([np.full(len(p), u, np.int32)
                            for u, p in enumerate(train_pos)])
    items = np.concatenate(train_pos)
    graph = build_bipartite_graph(users, items, n_users, n_items)
    cfg = LightGCNConfig(latent_dim=args.dim, n_layers=args.layers,
                         lr=args.lr, weight_decay=args.weight_decay,
                         compress_rate=args.compress_rate,
                         hot_rate=args.hot_rate,
                         sketch_threshold=args.sketch_threshold,
                         seed=args.seed, optimizer=args.optimizer)
    model = LightGCN(cfg, graph)
    state = model.init()
    start_ep = 0
    if args.save_dir:
        ck, ep = latest_epoch_ckpt(args.save_dir, "lightgcn")
        if ck:
            state, _ = load_state(ck, state)
            start_ep = ep + 1
            print(f"resumed from {ck} (epoch {ep})", flush=True)
    step = model.jit_step()

    rec = float("nan")
    if start_ep >= args.epochs:
        rec = model.recall_at_k(state, train_pos, test_pos, k=args.topk)
        print(f"nothing to train (resumed epoch {start_ep} >= --epochs "
              f"{args.epochs}); recall@{args.topk} {rec:.4f}", flush=True)
    for ep in range(start_ep, args.epochs):
        t0 = time.time()
        triples = sample_negative(n_users, n_items, len(items), train_pos,
                                  seed=args.seed + ep)
        perm = np.random.default_rng(ep).permutation(len(triples))
        triples = triples[perm]
        # clamp so tiny datasets still take gradient steps (a fixed batch
        # keeps the jitted step at one compiled shape; the tail remainder
        # smaller than the batch is dropped, like the CTR drop_last path)
        bb = min(args.bpr_batch, len(triples))
        losses = []
        for lo in range(0, len(triples) - bb + 1, bb):
            t = triples[lo:lo + bb]
            state, loss = step(state, jnp.asarray(t[:, 0]),
                               jnp.asarray(t[:, 1]), jnp.asarray(t[:, 2]))
            losses.append(float(loss))
        rec = model.recall_at_k(state, train_pos, test_pos, k=args.topk)
        print(f"epoch {ep}: bpr_loss {np.mean(losses):.4f} "
              f"recall@{args.topk} {rec:.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)
        if args.save_dir:
            save_state(osp.join(args.save_dir, f"lightgcn_epoch_{ep}.ckpt"),
                       state, {"epoch": ep, "recall": rec})
    return rec


def pinsage_hit_ndcg(reps, train_pos, test_pos, k=10):
    """Latest-item nearest-neighbor recommendation (PinSAGE
    evaluation.py:52-115): seed each user with their last train item,
    rank all items by representation dot product excluding interacted
    ones; hit@k = any held-out item in the top-k, NDCG with binary
    relevance (idcg = 1)."""
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    hits, ndcgs = [], []
    for u in range(len(train_pos)):
        if len(train_pos[u]) == 0 or len(test_pos[u]) == 0:
            continue
        seed = int(train_pos[u][-1])
        dist = reps[seed] @ reps.T
        dist[np.asarray(train_pos[u], dtype=int)] = -np.inf
        kk = min(k, len(dist) - 1)
        topk = np.argpartition(-dist, kk)[:kk]
        topk = topk[np.argsort(-dist[topk])]
        rel = np.isin(topk, test_pos[u])
        hits.append(bool(rel.any()))
        ndcgs.append(float((rel * discounts[: len(rel)]).sum()))
    if not hits:
        return 0.0, 0.0
    return float(np.mean(hits)), float(np.mean(ndcgs))


def run_pinsage(args, train_pos, test_pos, n_items):
    from cafe_tpu.models.graphrec.pinsage import (
        PinSAGE, PinSAGEConfig, RandomWalkSampler)

    cfg = PinSAGEConfig(hidden_dims=args.dim, n_layers=min(args.layers, 2),
                        lr=args.lr, compress_ratio=args.compress_ratio,
                        sketch_threshold=args.sketch_threshold,
                        seed=args.seed, optimizer=args.optimizer)
    model = PinSAGE(cfg, n_items)
    item_users = [[] for _ in range(n_items)]
    for u, its in enumerate(train_pos):
        for it in its:
            item_users[int(it)].append(u)
    item_users = [np.asarray(us, dtype=np.int32) for us in item_users]
    sampler = RandomWalkSampler(train_pos, item_users, seed=args.seed)
    state = model.init()
    start_ep = 0
    if args.save_dir:
        ck, ep = latest_epoch_ckpt(args.save_dir, "pinsage")
        if ck:
            state, _ = load_state(ck, state)
            start_ep = ep + 1
            print(f"resumed from {ck} (epoch {ep})", flush=True)
    import jax
    step = jax.jit(model.train_step, static_argnames=())

    batches = max(args.steps_per_epoch, 1)
    losses = [float("nan")]
    if start_ep >= args.epochs:
        print(f"nothing to train: resumed epoch {start_ep} >= "
              f"--epochs {args.epochs}", flush=True)
    for ep in range(start_ep, args.epochs):
        t0 = time.time()
        losses = []
        for _ in range(batches):
            batch = model.make_batch(sampler, args.bpr_batch)
            state, loss = step(state, batch, args.lr)
            losses.append(float(loss))
        reps = model.represent_items(state, sampler)
        hit, nd = pinsage_hit_ndcg(reps, train_pos, test_pos, k=args.topk)
        print(f"epoch {ep}: margin_loss {np.mean(losses):.4f} "
              f"hit@{args.topk} {hit:.4f} ndcg {nd:.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)
        if args.save_dir:
            save_state(osp.join(args.save_dir, f"pinsage_epoch_{ep}.ckpt"),
                       state, {"epoch": ep, "loss": float(np.mean(losses)),
                               "hit": hit, "ndcg": nd})
    return float(np.mean(losses))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", choices=["lightgcn", "pinsage"],
                   default="lightgcn")
    p.add_argument("--data_path", default="",
                   help="dir with train.txt/test.txt (gowalla format)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--bpr_batch", type=int, default=2048)
    p.add_argument("--steps_per_epoch", type=int, default=50,
                   help="pinsage only")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--lr", type=float, default=0.001,
                   help="the reference's Adam regime (world.py:48-49, "
                        "PinSAGE model.py:133); use ~0.1 with sgd/adagrad")
    p.add_argument("--optimizer", choices=["sgd", "adagrad", "adam"],
                   default="adam",
                   help="dense params get dense Adam, embedding tables "
                        "rows-Adam (ops/sparse.py); matches the reference "
                        "(PinSAGE/model.py:133, LightGCN/code/utils.py:39)")
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--topk", type=int, default=20)
    # CAFE knobs (world.py:48-49 defaults; compress_rate 1.0 = full table)
    p.add_argument("--compress_rate", type=float, default=1.0)
    p.add_argument("--hot_rate", type=float, default=0.7)
    p.add_argument("--compress_ratio", type=int, default=1,
                   help="pinsage CAFE knob (layers.py:81-90); >1 enables")
    p.add_argument("--sketch_threshold", type=float, default=500.0)
    p.add_argument("--save_dir", default="")
    p.add_argument("--seed", type=int, default=2020)
    # synthetic graph knobs
    p.add_argument("--synthetic_users", type=int, default=600)
    p.add_argument("--synthetic_items", type=int, default=1200)
    p.add_argument("--force_platform", default="",
                   help="jax platform override (e.g. cpu); the env-var "
                        "route (JAX_PLATFORMS) is silently ignored by "
                        "the TPU tunnel plugin — same knob as main.py")
    args = p.parse_args(argv)

    if args.force_platform:
        import jax
        jax.config.update("jax_platforms", args.force_platform)

    if args.data_path:
        train_pos, n1 = load_gowalla_txt(osp.join(args.data_path,
                                                  "train.txt"))
        test_pos, n2 = load_gowalla_txt(osp.join(args.data_path,
                                                 "test.txt"))
        # pad BOTH ways so cold-start users present only in test.txt are
        # still counted by recall@k (with empty train history)
        while len(test_pos) < len(train_pos):
            test_pos.append(np.empty(0, np.int32))
        while len(train_pos) < len(test_pos):
            train_pos.append(np.empty(0, np.int32))
        n_items = max(n1, n2)
    else:
        train_pos, test_pos, n_items = make_synthetic_interactions(
            args.synthetic_users, args.synthetic_items, seed=args.seed)
    print(f"{args.model}: {len(train_pos)} users, {n_items} items, "
          f"{sum(len(p) for p in train_pos)} train interactions", flush=True)

    if args.model == "lightgcn":
        run_lightgcn(args, train_pos, test_pos, n_items)
    else:
        run_pinsage(args, train_pos, test_pos, n_items)


if __name__ == "__main__":
    main()
