"""IN1K/ADE20K-scale proofs of the evaluation paths on the real chip.

Round-5 target (VERDICT.md Next#2): the eval machinery had only ever seen
test-sized inputs; the paths the paper's 85.0% (k-NN) / 85.6% (linear) /
seg-probe numbers flow through are exercised here at FULL scale with
synthetic class-separable features, recording wall time + peak HBM:

  knn      1,281,167 x 1280 bank, 50,000 queries, k in {10,20,100,200},
           T=0.07 — the reference protocol sizes
           (reference: dinov2/eval/knn.py:100-185, IN1K train/val).
  knn-mesh the SHARDED merge (knn_classify_sharded) over an 8-virtual-
           device CPU mesh at the full bank size, checked against the
           unsharded oracle on a query subset.
  linear   the 52-classifier grid (4 variants x 13 lrs) trained the full
           12,500 iterations at batch 256, ViT-H/14 feature dims
           (reference: dinov2/eval/linear.py:465-628).
  seg      ADE20K-scale logistic-regression probe: 20,210 imgs x 196
           patches (224px/16) = 3,961,160 x 1024 features, 150 classes —
           on-device optax.lbfgs backend (the cuML L-BFGS analog), plus a
           timed sklearn sample to quantify why the host path is not
           viable at this scale (reference: eval_segmentation.py:281-337).

Each subcommand prints one `SCALE_<NAME> {json}` line and appends it to
<repo>/.soak/scale_eval.jsonl.

Usage: python scripts/scale_eval_tpu.py {knn,knn-mesh,linear,seg,all}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, ".soak", "scale_eval.jsonl")

# IN1K protocol sizes (reference: dinov2/data/datasets/image_net.py splits)
N_TRAIN = 1_281_167
N_VAL = 50_000
N_CLASSES = 1000
DIM = 1280  # ViT-H/14 embed dim

# ADE20K probe sizes at the reference's resolution=224, patch 16
ADE_TRAIN_IMGS = 20_210
ADE_VAL_IMGS = 2_000
ADE_PATCHES = (224 // 16) ** 2
ADE_CLASSES = 150
ADE_DIM = 1024  # ViT-L feature dim (paper's seg backbone family)


def _emit(name: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    line = {"name": name, **payload}
    with open(OUT, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(f"SCALE_{name.upper()} " + json.dumps(line), flush=True)


def _mem_stats():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats()
        return {
            "peak_hbm_gib": round(s.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
            "hbm_in_use_gib": round(s.get("bytes_in_use", 0) / 2 ** 30, 2),
        }
    except Exception:
        return {}


def _setup_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_class_features(key, labels, means, noise=0.35, dtype=None):
    """feats = means[labels] + noise*N(0,1), generated on device."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or means.dtype
    base = means[labels]
    return base + noise * jax.random.normal(key, base.shape, dtype)


def run_knn() -> None:
    import jax
    import jax.numpy as jnp

    _setup_cache()
    from octic_vits_tpu.eval.knn import knn_classify, knn_classify_sharded
    from octic_vits_tpu.parallel import create_mesh

    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    dtype = jnp.bfloat16
    means = jax.random.normal(k0, (N_CLASSES, DIM), dtype)
    tr_labels = jnp.arange(N_TRAIN, dtype=jnp.int32) % N_CLASSES
    q_labels = jnp.arange(N_VAL, dtype=jnp.int32) % N_CLASSES

    t0 = time.time()
    bank = make_class_features(k1, tr_labels, means)
    queries = make_class_features(k2, q_labels, means)
    jax.block_until_ready((bank, queries))
    gen_s = time.time() - t0

    ks = (10, 20, 100, 200)
    t0 = time.time()
    votes = knn_classify(bank, tr_labels, queries, N_CLASSES, ks=ks,
                         batch_size=512)
    jax.block_until_ready(votes)
    knn_s = time.time() - t0
    accs = {
        str(k): round(float((jnp.argmax(v, -1) == q_labels).mean()), 4)
        for k, v in votes.items()
    }

    # the sharded merge path at full bank scale (driver-grade API; mesh is
    # the chip set available to this process)
    mesh = create_mesh()
    t0 = time.time()
    votes_sh = knn_classify_sharded(
        bank, tr_labels, queries[:4096], N_CLASSES, mesh, ks=(200,),
        batch_size=512,
    )
    jax.block_until_ready(votes_sh)
    sh_s = time.time() - t0
    acc_sh = round(
        float((jnp.argmax(votes_sh[200], -1) == q_labels[:4096]).mean()), 4
    )

    _emit("knn", {
        "bank": [N_TRAIN, DIM], "queries": N_VAL, "ks": list(ks),
        "gen_s": round(gen_s, 1), "knn_wall_s": round(knn_s, 1),
        "img_per_s": round(N_VAL / knn_s, 1),
        "top1_by_k": accs,
        "sharded_4096q_wall_s": round(sh_s, 1),
        "sharded_top1_k200": acc_sh,
        **_mem_stats(),
    })


def run_knn_mesh() -> None:
    """Full-bank sharded merge on an 8-virtual-device CPU mesh, vs oracle."""
    if os.environ.get("_SCALE_KNN_MESH_CHILD") != "1":
        import subprocess

        env = dict(os.environ)
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        )
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["_SCALE_KNN_MESH_CHILD"] = "1"
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "knn-mesh"],
            env=env, cwd=REPO,
        ).returncode
        if rc != 0:
            raise RuntimeError(f"knn-mesh child failed rc={rc}")
        return

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from octic_vits_tpu.eval.knn import knn_classify, knn_classify_sharded
    from octic_vits_tpu.parallel import create_mesh

    assert jax.device_count() >= 8, jax.devices()
    k0 = jax.random.PRNGKey(0)
    npr = np.random.RandomState(0)
    means = npr.randn(N_CLASSES, DIM).astype(np.float32)
    tr_labels = np.arange(N_TRAIN, dtype=np.int32) % N_CLASSES
    # bank built on host in chunks (125G RAM; 6.6 GiB f32)
    t0 = time.time()
    bank = np.empty((N_TRAIN, DIM), np.float32)
    for s in range(0, N_TRAIN, 200_000):
        e = min(s + 200_000, N_TRAIN)
        bank[s:e] = means[tr_labels[s:e]] + 0.35 * npr.randn(
            e - s, DIM
        ).astype(np.float32)
    nq = 512
    q_labels = np.arange(nq, dtype=np.int32) % N_CLASSES
    queries = means[q_labels] + 0.35 * npr.randn(nq, DIM).astype(np.float32)
    gen_s = time.time() - t0

    mesh = create_mesh()
    n_dev = mesh.devices.size
    t0 = time.time()
    votes = knn_classify_sharded(bank, tr_labels, queries, N_CLASSES, mesh,
                                 ks=(10, 200), batch_size=128)
    jax.block_until_ready(votes)
    sh_s = time.time() - t0

    # oracle agreement on a subset
    sub = 64
    oracle = knn_classify(bank[: N_TRAIN], tr_labels, queries[:sub],
                          N_CLASSES, ks=(10, 200), batch_size=32)
    agree = {}
    for k in (10, 200):
        a = np.asarray(jnp.argmax(votes[k][:sub], -1))
        b = np.asarray(jnp.argmax(oracle[k], -1))
        agree[str(k)] = round(float((a == b).mean()), 4)

    _emit("knn_mesh", {
        "bank": [N_TRAIN, DIM], "queries": nq, "mesh_devices": int(n_dev),
        "gen_s": round(gen_s, 1), "sharded_wall_s": round(sh_s, 1),
        "oracle_argmax_agreement": agree,
    })


def run_linear() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    _setup_cache()
    from octic_vits_tpu.eval.linear import train_and_eval_linear_probes

    BATCH = 256
    ITERS = 12_500
    N_PATCH = 256  # ViT-H/14 @224 patch tokens

    k = jax.random.PRNGKey(0)
    kM, kbase = jax.random.split(k)
    # per-block class means: 4 blocks' cls tokens + last block patch tokens
    means = jax.random.normal(kM, (4, N_CLASSES, DIM), jnp.float32)

    @jax.jit
    def feat_fn(labels, key):
        outs = []
        for i in range(4):
            ki, kp = jax.random.split(jax.random.fold_in(key, i))
            cls = means[i][labels] + 0.5 * jax.random.normal(
                ki, (labels.shape[0], DIM)
            )
            if i == 3:
                patch = cls[:, None, :] + 0.5 * jax.random.normal(
                    kp, (labels.shape[0], N_PATCH, DIM)
                )
            else:
                patch = cls[:, None, :]  # only the LAST block's patches are
                # consumed by build_probe_features' avgpool
            outs.append((patch, cls))
        return outs

    counter = {"i": 0}

    def train_feature_fn(labels):
        key = jax.random.fold_in(kbase, counter["i"])
        counter["i"] += 1
        return feat_fn(jnp.asarray(labels), key)

    npr = np.random.RandomState(0)

    # the "images" our feature fn consumes ARE the labels
    def train_iter_factory():
        def gen():
            while True:
                labels = npr.randint(0, N_CLASSES, (BATCH,))
                yield labels, labels
        return gen()

    def eval_iter():
        for s in range(0, N_VAL, BATCH):
            labels = np.arange(s, min(s + BATCH, N_VAL)) % N_CLASSES
            yield labels, labels

    t0 = time.time()
    results = train_and_eval_linear_probes(
        train_feature_fn,
        train_iter_factory,
        eval_iter(),
        num_classes=N_CLASSES,
        iters=ITERS,
        batch_size=BATCH,
    )
    wall = time.time() - t0
    _emit("linear", {
        "grid": "4 variants x 13 lrs = 52 classifiers",
        "iters": ITERS, "batch": BATCH,
        "feature_dims": [DIM, 2 * DIM, 4 * DIM, 5 * DIM],
        "wall_s": round(wall, 1),
        "best_classifier": results["best_classifier"],
        "best_top1": round(results["best_top1"], 4),
        **_mem_stats(),
    })


def run_seg() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    _setup_cache()
    from octic_vits_tpu.eval.segmentation import LogregSegProbe

    n_tr = ADE_TRAIN_IMGS * ADE_PATCHES
    n_va = ADE_VAL_IMGS * ADE_PATCHES
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
    means = jax.random.normal(k0, (ADE_CLASSES, ADE_DIM), jnp.bfloat16)
    tr_labels_np = np.arange(n_tr, dtype=np.int32) % ADE_CLASSES
    va_labels = np.arange(n_va, dtype=np.int32) % ADE_CLASSES
    # jit the generation so the [4M, 1024] gather + noise + add fuse into
    # ONE output buffer (eager materializes 3 copies -> 24 GiB -> OOM)
    gen = jax.jit(lambda k, lab: make_class_features(k, lab, means, noise=1.0))
    tr = gen(k1, jnp.asarray(tr_labels_np))
    va = gen(k2, jnp.asarray(va_labels))
    jax.block_until_ready((tr, va))

    # on-device L-BFGS at full ADE scale (one grid point; the 8-point C
    # grid is embarrassingly parallel over grid_slice round-robin)
    t0 = time.time()
    probe = LogregSegProbe(C=1.0, max_iter=1000, tol=1e-12,
                           num_classes=ADE_CLASSES, backend="jax")
    probe.fit(tr, tr_labels_np)
    fit_s = time.time() - t0
    t0 = time.time()
    pred = probe.predict(np.asarray(va, np.float32))
    pred_s = time.time() - t0
    acc = round(float((pred == va_labels).mean()), 4)

    # sklearn sample timing (host, 1 core): per-iteration cost measured at
    # a small N, projected to the full set at max_iter=1000
    sk_n, sk_iters = 20_000, 50
    xs = np.asarray(tr[:sk_n], np.float32)
    ys = tr_labels_np[:sk_n]
    t0 = time.time()
    LogregSegProbe(C=1.0, max_iter=sk_iters, tol=1e-12,
                   num_classes=ADE_CLASSES, backend="sklearn").fit(xs, ys)
    sk_s = time.time() - t0
    sk_proj_h = sk_s * (n_tr / sk_n) * (1000 / sk_iters) / 3600

    _emit("seg_logreg", {
        "train_feats": [n_tr, ADE_DIM], "classes": ADE_CLASSES,
        "jax_lbfgs_fit_s": round(fit_s, 1),
        "jax_iters": probe.n_iter_,
        "predict_s": round(pred_s, 1),
        "val_acc": acc,
        "grid_points": 16,
        "sklearn_sample": {"n": sk_n, "iters": sk_iters,
                           "wall_s": round(sk_s, 1)},
        "sklearn_projected_hours_full": round(sk_proj_h, 1),
        **_mem_stats(),
    })


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("knn", "all"):
        run_knn()
    if which in ("knn-mesh", "all"):
        run_knn_mesh()
    if which in ("linear", "all"):
        run_linear()
    if which in ("seg", "all"):
        run_seg()


if __name__ == "__main__":
    main()
