"""Checkpoint converter, FLOPs, config, logging, and data-pipeline tests."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_flops_match_readme_tables():
    """Hybrid ViT-H/14 ~102 G MACs, standard ~167 G; hybrid ViT-L/16 ~38 G
    (reference: README.md:112-143)."""
    from octic_vits_tpu.utils.flops import (
        ViTSpec, gmacs, octic_vit_macs, standard_vit_macs,
    )

    h14 = ViTSpec(patch_size=14, embed_dim=1280, depth=32)
    assert 95 < gmacs(octic_vit_macs(h14)) < 108
    assert 160 < gmacs(standard_vit_macs(h14)) < 175
    l16 = ViTSpec(patch_size=16, embed_dim=1024, depth=24)
    assert 34 < gmacs(octic_vit_macs(l16)) < 42
    assert 58 < gmacs(standard_vit_macs(l16)) < 66
    # ~40% FLOP reduction claim (README.md:36)
    ratio = octic_vit_macs(h14) / standard_vit_macs(h14)
    assert 0.55 < ratio < 0.65


def _fake_octic_state_dict(depth=2, dim=32, patch=8, grid=4, ncls=10):
    """Reference-layout state dict with random values (names per
    octic_vits/model.py + d8_layers.py)."""
    rng = np.random.RandomState(0)
    c8 = dim // 8
    sd = {}
    for i in range(6):
        sd[f"pos_embed.{i}"] = rng.randn(grid // 2, grid // 2, c8).astype(np.float32)
    sd["cls_token.0"] = rng.randn(1, 1, c8).astype(np.float32)
    for name in ["A1", "A2", "B1", "B2", "E_left", "E_right"]:
        sd[f"patch_embed.lift8.conv_{name}.weight"] = rng.randn(
            c8, 3, patch // 2, patch // 2
        ).astype(np.float32)
    sd["patch_embed.lift8.conv_A1.bias"] = rng.randn(c8).astype(np.float32)

    def lin_d8(prefix, cin, cout, bias=True):
        for irr in ["A1", "A2", "B1", "B2"]:
            sd[f"{prefix}.lin_{irr}.weight"] = rng.randn(cout // 8, cin // 8).astype(np.float32)
        sd[f"{prefix}.lin_E.weight"] = rng.randn(cout // 4, cin // 4).astype(np.float32)
        if bias:
            sd[f"{prefix}.lin_A1.bias"] = rng.randn(cout // 8).astype(np.float32)

    def affine(prefix, with_beta):
        for irr in ["A1", "A2", "B1", "B2"]:
            sd[f"{prefix}.alpha_{irr}"] = rng.randn(c8).astype(np.float32)
        sd[f"{prefix}.alpha_E"] = rng.randn(dim // 4).astype(np.float32)
        if with_beta:
            sd[f"{prefix}.beta"] = rng.randn(c8).astype(np.float32)

    brk = depth // 2
    for i in range(depth):
        p = f"blocks.{i}"
        if i < brk:
            affine(f"{p}.norm1.scaling", True)
            affine(f"{p}.norm2.scaling", True)
            lin_d8(f"{p}.attn.qkv", dim, 3 * dim)
            lin_d8(f"{p}.attn.proj", dim, dim)
            lin_d8(f"{p}.mlp.fc1", dim, 4 * dim)
            lin_d8(f"{p}.mlp.fc2", 4 * dim, dim)
            affine(f"{p}.gamma_1", False)
            affine(f"{p}.gamma_2", False)
        else:
            for nm in ["norm1", "norm2"]:
                sd[f"{p}.{nm}.weight"] = rng.randn(dim).astype(np.float32)
                sd[f"{p}.{nm}.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.attn.qkv.weight"] = rng.randn(3 * dim, dim).astype(np.float32)
            sd[f"{p}.attn.qkv.bias"] = rng.randn(3 * dim).astype(np.float32)
            sd[f"{p}.attn.proj.weight"] = rng.randn(dim, dim).astype(np.float32)
            sd[f"{p}.attn.proj.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.weight"] = rng.randn(4 * dim, dim).astype(np.float32)
            sd[f"{p}.mlp.fc1.bias"] = rng.randn(4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.weight"] = rng.randn(dim, 4 * dim).astype(np.float32)
            sd[f"{p}.mlp.fc2.bias"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.gamma_1"] = rng.randn(dim).astype(np.float32)
            sd[f"{p}.gamma_2"] = rng.randn(dim).astype(np.float32)
    sd["norm.weight"] = rng.randn(dim).astype(np.float32)
    sd["norm.bias"] = rng.randn(dim).astype(np.float32)
    sd["head.weight"] = rng.randn(ncls, dim).astype(np.float32)
    sd["head.bias"] = rng.randn(ncls).astype(np.float32)
    return sd


def test_convert_octic_vit_structure_and_forward():
    from octic_vits_tpu.models import OcticVisionTransformer
    from octic_vits_tpu.utils.convert import convert_octic_vit

    depth, dim = 2, 32
    sd = {"_orig_mod." + k: v for k, v in _fake_octic_state_dict(depth, dim).items()}
    params = convert_octic_vit(sd, depth=depth, style="deit")
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=dim, depth=depth, num_heads=2,
        qkv_bias=True, num_classes=10,
    )
    ref_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    # identical tree structure + shapes
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_shapes == got_shapes, (
        f"\nref: {ref_shapes}\ngot: {got_shapes}"
    )
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)),
    )
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lift_conv_matches_torch_conv2d():
    """The patchify-matmul lifting embed must equal torch F.conv2d with the
    expanded kernel (stride == kernel) — validates the conv lowering."""
    torch = pytest.importorskip("torch")
    from octic_vits_tpu.layers.d8_layers import _expand_lift_kernel, _patchify

    rng = np.random.RandomState(0)
    p, cin, cout = 8, 3, 4
    quad = rng.randn(p // 2, p // 2, cin, cout).astype(np.float32)
    img = rng.randn(2, 16, 16, cin).astype(np.float32)

    for irrep in ["A1", "A2", "B1", "B2", "E"]:
        kernel = np.asarray(_expand_lift_kernel(jnp.asarray(quad), irrep))
        # torch conv: weight [O, I, kh, kw]
        w_t = torch.from_numpy(np.transpose(kernel, (3, 2, 0, 1)).copy())
        x_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
        ref = torch.nn.functional.conv2d(x_t, w_t, stride=p).numpy()
        ref = np.transpose(ref, (0, 2, 3, 1))  # NCHW -> NHWC

        patches = np.asarray(_patchify(jnp.asarray(img), p))
        mat = kernel.reshape(p * p * cin, cout)
        ours = (patches @ mat).reshape(2, 2, 2, cout)
        np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=irrep)


def test_config_merge_and_dotlist(tmp_path):
    from octic_vits_tpu.utils.config import build_config, write_config

    default = {"optim": {"lr": 0.004, "epochs": 100}, "train": {"seed": 0}}
    cfg_file = tmp_path / "exp.yaml"
    cfg_file.write_text("optim:\n  epochs: 50\n")
    os.environ["TEST_DATA_PATH"] = "/data/x"
    cfg = build_config(
        default, str(cfg_file), ["train.seed=7", "train.path=${TEST_DATA_PATH}"]
    )
    assert cfg.optim.lr == 0.004
    assert cfg.optim.epochs == 50
    assert cfg.train.seed == 7
    assert cfg.train.path == "/data/x"
    out = write_config(cfg, str(tmp_path))
    assert os.path.exists(out)


def test_metric_logger(tmp_path):
    from octic_vits_tpu.utils.logging import MetricLogger

    log = MetricLogger(output_file=str(tmp_path / "m.json"))
    for i in range(5):
        log.update(loss=float(i), acc=0.5)
    assert abs(log.meters["loss"].global_avg - 2.0) < 1e-6
    log.dump_in_output_file(4, 0.1, 0.01)
    assert (tmp_path / "m.json").exists()
    for _ in log.log_every(range(3), print_freq=10, header="t"):
        pass


def test_dataloader_and_samplers(tmp_path):
    from PIL import Image

    from octic_vits_tpu.data.datasets import ImageFolder, ImageNetExtra
    from octic_vits_tpu.data.loaders import DataLoader, make_dataset
    from octic_vits_tpu.data.samplers import (
        EpochSampler, InfiniteSampler, RASampler, ShardedInfiniteSampler,
    )
    from octic_vits_tpu.data.transforms import eval_transform

    root = tmp_path / "ds"
    for c in ["a", "b"]:
        (root / c).mkdir(parents=True)
        for i in range(4):
            Image.new("RGB", (40, 40), (i * 30, 0, 0)).save(root / c / f"{i}.jpg")

    ds = ImageFolder(str(root), transform=lambda im: eval_transform(im, 32))
    assert len(ds) == 8
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and y == 0

    # extra-metadata path
    extra = tmp_path / "extra"
    ImageNetExtra.dump_extra(str(root), str(extra), split="TRAIN")
    ds2 = make_dataset(
        f"ImageNet:split=TRAIN:root={root}:extra={extra}",
        transform=lambda im: eval_transform(im, 32),
    )
    assert len(ds2) == 8 and ds2.get_target(0) in (0, 1)

    loader = DataLoader(ds, EpochSampler(len(ds)), batch_size=4, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2 and batches[0][0].shape == (4, 32, 32, 3)

    ra = RASampler(dataset_len=8, shard=0, num_shards=2)
    idx = list(ra)
    assert len(idx) == len(ra)

    inf = iter(InfiniteSampler(8, advance=3))
    assert len([next(inf) for _ in range(20)]) == 20
    sh = iter(ShardedInfiniteSampler(8, shard=1, num_shards=2, advance=2))
    vals = [next(sh) for _ in range(10)]
    assert all(0 <= v < 8 for v in vals)


def test_imagenet22k_tar_reader(tmp_path):
    """Real per-class tarball layout (reference:
    dinov2/data/datasets/image_net_22k.py): members read via mmap'd offsets,
    gzip members transparently decompressed, entries cached to extra/."""
    import gzip
    import io
    import tarfile

    from PIL import Image

    from octic_vits_tpu.data.datasets import ImageNet22k
    from octic_vits_tpu.data.loaders import make_dataset

    root = tmp_path / "in22k"
    root.mkdir()

    def jpeg_bytes(color):
        buf = io.BytesIO()
        Image.new("RGB", (24, 24), color).save(buf, format="JPEG")
        return buf.getvalue()

    for ci, class_id in enumerate(["n001", "n002"]):
        with tarfile.open(root / f"{class_id}.tar", "w") as tf:
            for j in range(3):
                data = jpeg_bytes((40 * (ci + 1), 10 * j, 0))
                if ci == 1 and j == 2:  # one gzipped member like real 22k
                    data = gzip.compress(data)
                info = tarfile.TarInfo(f"{class_id}_{j}.JPEG")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))

    extra = tmp_path / "extra22k"
    ds = ImageNet22k(str(root), str(extra))
    assert len(ds) == 6
    assert (extra / "entries.npy").exists() and (extra / "class-ids.npy").exists()
    assert list(ds.get_targets()) == [0, 0, 0, 1, 1, 1]
    img, target = ds[4]
    assert img.size == (24, 24) and target == 1
    img_gz, t_gz = ds[5]  # the gzipped member
    assert img_gz.size == (24, 24) and t_gz == 1

    # second instantiation uses the cache; DSL route works too
    ds2 = make_dataset(f"ImageNet22k:root={root}:extra={extra}")
    assert len(ds2) == 6 and ds2.get_target(0) == 0


def test_cifar100_pickle_reader(tmp_path):
    import pickle

    from octic_vits_tpu.data.datasets import CIFAR100, build_deit_dataset

    base = tmp_path / "cifar-100-python"
    base.mkdir()
    rng = np.random.RandomState(0)
    for split, n in [("train", 8), ("test", 4)]:
        d = {
            "data": rng.randint(0, 255, (n, 3072), np.uint8),
            "fine_labels": list(rng.randint(0, 100, n)),
        }
        with open(base / split, "wb") as f:
            pickle.dump(d, f)

    ds = CIFAR100(str(tmp_path), train=True)
    assert len(ds) == 8
    img, y = ds[0]
    assert img.size == (32, 32) and 0 <= y < 100

    ds_val, ncls = build_deit_dataset("CIFAR", str(tmp_path), False)
    assert len(ds_val) == 4 and ncls == 100


def test_inat_json_reader(tmp_path):
    import json

    from PIL import Image

    from octic_vits_tpu.data.datasets import build_deit_dataset

    root = tmp_path / "inat"
    (root / "imgs").mkdir(parents=True)
    categories = [
        {"id": 0, "name": "sparrow", "supercategory": "Birds"},
        {"id": 1, "name": "oak", "supercategory": "Plants"},
    ]
    for split, n in [("train", 4), ("val", 2)]:
        images, anns = [], []
        for i in range(n):
            fname = f"imgs/{split}_{i}.jpg"
            Image.new("RGB", (20, 20), (i * 40, 0, 0)).save(root / fname)
            images.append({"id": i, "file_name": fname})
            anns.append({"image_id": i, "category_id": i % 2})
        with open(root / f"{split}2018.json", "w") as f:
            json.dump({"images": images, "annotations": anns}, f)
    with open(root / "categories.json", "w") as f:
        json.dump(categories, f)

    ds, ncls = build_deit_dataset("INAT", str(root), True)
    assert ncls == 2 and len(ds) == 4
    img, y = ds[1]
    assert img.size == (20, 20) and y == 1
    ds_val, _ = build_deit_dataset("INAT", str(root), False)
    assert len(ds_val) == 2
    # supercategory taxonomy level also resolves
    ds_super, ncls_super = build_deit_dataset(
        "INAT", str(root), True, inat_category="supercategory"
    )
    assert ncls_super == 2


def test_deit_engine_train_step():
    import optax

    from octic_vits_tpu.models import VisionTransformer
    from octic_vits_tpu.train.common import create_train_state
    from octic_vits_tpu.train.deit.engine import (
        DeiTConfig, build_optimizer, lr_schedule, make_deit_train_step,
        make_eval_step,
    )

    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=2,
        num_classes=4, qkv_bias=True,
    )
    cfg = DeiTConfig(num_classes=4, epochs=2, steps_per_epoch=4,
                     warmup_epochs=1, lr=1e-3, ema_decay=0.9)
    img = jnp.zeros((8, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    tx = build_optimizer(cfg, params)
    state = create_train_state(params, tx, ema=True)
    step = jax.jit(make_deit_train_step(model, cfg, tx), donate_argnums=(0,))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    labels = jnp.arange(8) % 4
    state, metrics = step(state, images, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # lr schedule sanity
    sched = lr_schedule(cfg)
    assert float(sched(0)) < float(sched(cfg.steps_per_epoch))
    # eval step
    ev = jax.jit(make_eval_step(model))
    out = ev(state.params, images, labels)
    assert int(out["n"]) == 8


def test_knn_and_linear_probe():
    from octic_vits_tpu.eval.knn import evaluate_knn
    from octic_vits_tpu.eval.linear import (
        DEFAULT_LRS, LinearProbeBank, ProbeVariant, build_probe_features,
    )

    rng = np.random.RandomState(0)
    centers = rng.randn(4, 16) * 3
    train_x = np.concatenate([centers[i] + 0.1 * rng.randn(32, 16) for i in range(4)])
    train_y = np.repeat(np.arange(4), 32)
    test_x = np.concatenate([centers[i] + 0.1 * rng.randn(8, 16) for i in range(4)])
    test_y = np.repeat(np.arange(4), 8)
    res = evaluate_knn(train_x, train_y, test_x, test_y, num_classes=4, ks=(10,))
    assert res["knn_10_top1"] > 0.95

    bank = LinearProbeBank(dim=16, num_classes=4, lrs=[0.1, 0.01], iters=50)
    for it in range(50):
        bank.train_step(jnp.asarray(train_x, jnp.float32), jnp.asarray(train_y), it)
    logits = np.asarray(bank.predict(jnp.asarray(test_x, jnp.float32)))
    acc = (logits.argmax(-1) == test_y[None]).mean(-1)
    assert acc.max() > 0.9

    outs = [(jnp.ones((2, 5, 8)), jnp.zeros((2, 8))) for _ in range(4)]
    f = build_probe_features(outs, ProbeVariant("4_avg", 4, True))
    assert f.shape == (2, 4 * 8 + 8)

    # sharded bank (DDP analog): same training result on an 8-device mesh
    from octic_vits_tpu.parallel import create_mesh

    mesh = create_mesh(jax.devices()[:8], fsdp=2)
    bank_sh = LinearProbeBank(dim=16, num_classes=4, lrs=[0.1, 0.01],
                              iters=50, mesh=mesh)
    for it in range(50):
        bank_sh.train_step(jnp.asarray(train_x, jnp.float32),
                           jnp.asarray(train_y), it)
    logits_sh = np.asarray(bank_sh.predict(jnp.asarray(test_x, jnp.float32)))
    acc_sh = (logits_sh.argmax(-1) == test_y[None]).mean(-1)
    assert acc_sh.max() > 0.9
    np.testing.assert_allclose(logits_sh, logits, atol=1e-4)


def test_mixup_cutmix():
    from octic_vits_tpu.data.mixup import mixup_cutmix

    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    mixed, targets = mixup_cutmix(
        jax.random.PRNGKey(1), imgs, labels, num_classes=4
    )
    assert mixed.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), 1.0, atol=1e-5)


def test_dataloader_process_workers(tmp_path):
    """Fork-based process workers deliver the same sample set as threads
    (dataset inherited by fork; per-worker reseeded RNG)."""
    from PIL import Image

    from octic_vits_tpu.data.datasets import ImageFolder
    from octic_vits_tpu.data.loaders import DataLoader
    from octic_vits_tpu.data.samplers import EpochSampler
    from octic_vits_tpu.data.transforms import eval_transform

    root = tmp_path / "pd"
    (root / "a").mkdir(parents=True)
    for i in range(8):
        Image.new("RGB", (40, 40), (i * 25, 0, 0)).save(root / "a" / f"{i}.jpg")
    ds = ImageFolder(str(root), transform=lambda im: eval_transform(im, 32))
    loader = DataLoader(
        ds, EpochSampler(len(ds), shuffle=False), batch_size=4,
        num_workers=2, use_processes=True,
    )
    batches = list(loader)
    assert len(batches) == 2
    xs, ys = batches[0]
    assert xs.shape == (4, 32, 32, 3) and list(ys) == [0, 0, 0, 0]
    # matches the thread loader bit-for-bit (deterministic transform)
    tl = DataLoader(ds, EpochSampler(len(ds), shuffle=False), batch_size=4,
                    num_workers=2)
    xs_t, _ = next(iter(tl))
    np.testing.assert_array_equal(xs, xs_t)


def test_dino_augmentation_uint8_mode():
    from PIL import Image

    from octic_vits_tpu.data.transforms import DataAugmentationDINO

    aug = DataAugmentationDINO(local_crops_number=2, global_crops_size=32,
                               local_crops_size=16)
    aug.normalize = False
    import random as pyrandom
    out = aug(Image.new("RGB", (64, 64), (128, 64, 32)),
              rng=pyrandom.Random(0))
    assert out["global_crops"][0].dtype == np.uint8
    assert out["global_crops"][0].shape == (32, 32, 3)
    assert out["local_crops"][1].shape == (16, 16, 3)
