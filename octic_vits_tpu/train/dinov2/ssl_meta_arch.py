"""DINOv2 SSL meta-architecture: student/teacher + DINO/iBOT/KoLeo losses.

Functional JAX re-design of the reference SSLMetaArch
(reference: dinov2/train/ssl_meta_arch.py:31-414). One jitted SPMD step
computes the teacher targets (stop-gradient), the student multi-crop
forward, the packed student head batch, all three losses, the inline AdamW
update with per-leaf lr/wd multipliers, the teacher EMA, and the loss-center
EMAs. All collectives (grad all-reduce, center/sinkhorn reductions) are
emitted by XLA from shardings — no NCCL-style plumbing.

Static-shape notes: the iBOT masked-token buffer uses the collate
`upperbound` padding (reference: dinov2/data/collate.py:24-30) which is
deterministic given the config, so the step compiles once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from octic_vits_tpu.models import create_model
from octic_vits_tpu.models.dino_head import DINOHead
from octic_vits_tpu.train.dinov2 import losses as L
from octic_vits_tpu.train.dinov2.param_groups import build_multiplier_trees

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    arch: str = "hybrid_dinov2_vit_large_patch16"
    img_size: int = 224
    local_crop_size: int = 96
    patch_size: int = 16
    drop_path_rate: float = 0.3
    # dino
    dino_out_dim: int = 65536
    dino_head_hidden_dim: int = 2048
    dino_head_bottleneck_dim: int = 256
    dino_head_nlayers: int = 3
    dino_loss_weight: float = 1.0
    koleo_loss_weight: float = 0.1
    # False = reference per-GPU semantics (nearest neighbors within each
    # device's local batch shard, koleo_loss.py:38-48); True = one global
    # nearest-neighbor search over the full batch (stronger regularizer,
    # O(B_global^2) similarity matrix + a cls all-gather).
    koleo_global: bool = False
    # ibot
    do_ibot: bool = True
    ibot_separate_head: bool = False
    ibot_out_dim: int = 65536
    ibot_loss_weight: float = 1.0
    # temps/centering
    student_temp: float = 0.1
    center_momentum: float = 0.9
    centering: str = "centering"  # or "sinkhorn_knopp"
    # crops
    n_global_crops: int = 2
    n_local_crops: int = 8
    # optim
    adamw_beta1: float = 0.9
    adamw_beta2: float = 0.999
    clip_grad: float = 3.0
    layerwise_decay: float = 0.9
    patch_embed_lr_mult: float = 0.2
    # precision / kernels
    compute_dtype: Any = jnp.bfloat16
    use_pallas_kernels: bool = True  # fused attention/MLP kernels on TPU
    # scan-over-blocks trunk + selective remat for the backbones: required
    # to fit ViT-H/16 SSL (2x224 + 8x96 student fwd+bwd) in 16G HBM; off
    # for tiny test models where unrolled compiles are fine
    backbone_scan: bool = False
    backbone_remat: bool = False


class SSLState(NamedTuple):
    step: Array
    student: Any           # {'backbone':…, 'dino_head':…[, 'ibot_head':…]}
    teacher: Any           # same structure
    mu: Any                # AdamW first moment (student tree)
    nu: Any                # AdamW second moment
    dino_center: Array     # [K]
    ibot_center: Array     # [K_ibot]


def split_student_rngs(rngs):
    """Distinct randomness per student pass: the reference draws fresh
    dropout/droppath masks for the global-crop and local-crop forwards (two
    separate module calls, reference: ssl_meta_arch.py:243); folding a
    per-pass constant decorrelates the two streams."""
    if rngs is None:
        return None, None
    rngs_g = {k: jax.random.fold_in(v, 1) for k, v in rngs.items()}
    rngs_l = {k: jax.random.fold_in(v, 2) for k, v in rngs.items()}
    return rngs_g, rngs_l


class SSLMetaArch:
    def __init__(self, cfg: SSLConfig):
        self.cfg = cfg
        on_tpu = jax.default_backend() not in ("cpu",)
        octic_arch = cfg.arch.startswith(("hybrid", "d8", "_test"))
        if cfg.use_pallas_kernels and on_tpu:
            # NOT the MLP kernels: measured slightly slower for the SSL
            # step (hybrid 266 vs 263 ms, standard 280 vs 268 at ViT-L/16
            # B=16) — the 37-token local-crop forwards don't amortize the
            # dense kernel's row tiling
            kernel_kwargs = dict(use_pallas_attention=True)
            if octic_arch:
                # fuse_qkv: the octic qkv runs inside the attention kernel
                # (measured +12.8 img/s inference, neutral for training —
                # the teacher forwards get it for free)
                kernel_kwargs.update(use_pallas_linear=True,
                                     flat_e_carry=True, fuse_qkv=True)
        else:
            kernel_kwargs = {}
        if cfg.backbone_scan:
            kernel_kwargs.update(scan_blocks=True, remat=cfg.backbone_remat)
        self.backbone = create_model(
            cfg.arch,
            img_size=cfg.img_size,
            drop_path_rate=cfg.drop_path_rate,
            dtype=cfg.compute_dtype,
            **kernel_kwargs,
        )
        head = functools.partial(
            DINOHead,
            hidden_dim=cfg.dino_head_hidden_dim,
            bottleneck_dim=cfg.dino_head_bottleneck_dim,
            nlayers=cfg.dino_head_nlayers,
            dtype=cfg.compute_dtype,
        )
        self.dino_head = head(out_dim=cfg.dino_out_dim)
        self.ibot_head = (
            head(out_dim=cfg.ibot_out_dim)
            if cfg.do_ibot and cfg.ibot_separate_head
            else None
        )
        self.embed_dim = self.backbone.embed_dim

    # ---- init ------------------------------------------------------------

    def init(self, rng: jax.Array) -> SSLState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(rng, 3)
        img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), cfg.compute_dtype)
        backbone_params = self.backbone.init(k1, img)["params"]
        feat = jnp.zeros((1, self.embed_dim), cfg.compute_dtype)
        student = {
            "backbone": backbone_params,
            "dino_head": self.dino_head.init(k2, feat)["params"],
        }
        if self.ibot_head is not None:
            student["ibot_head"] = self.ibot_head.init(k3, feat)["params"]
        teacher = jax.tree.map(jnp.copy, student)
        zeros_like_tree = lambda t: jax.tree.map(
            lambda x: jnp.zeros_like(x, jnp.float32), t
        )
        return SSLState(
            step=jnp.zeros((), jnp.int32),
            student=student,
            teacher=teacher,
            mu=zeros_like_tree(student),
            nu=zeros_like_tree(student),
            dino_center=jnp.zeros((cfg.dino_out_dim,), jnp.float32),
            ibot_center=jnp.zeros((cfg.ibot_out_dim,), jnp.float32),
        )

    # ---- forward pieces ----------------------------------------------------

    def _backbone_feats(self, params, crops, masks, rngs, deterministic):
        return self.backbone.apply(
            {"params": params},
            crops,
            masks,
            deterministic=deterministic,
            rngs=rngs,
            method=self.backbone.forward_features,
        )

    def _apply_head(self, which: str, params, x):
        head = self.dino_head if which == "dino_head" else self.ibot_head
        return head.apply({"params": params[which]}, x)

    # ---- loss -------------------------------------------------------------

    def loss_fn(
        self,
        student_params,
        teacher_params,
        dino_center,
        ibot_center,
        batch: Dict[str, Array],
        teacher_temp: float,
        rngs,
        mesh=None,
    ):
        """Returns (loss, aux) where aux carries the loss dict and new centers.
        Mirrors forward_backward (reference: ssl_meta_arch.py:140-354).
        `mesh` (optional) enables the per-device KoLeo batch scope."""
        cfg = self.cfg
        rngs_g, rngs_l = split_student_rngs(rngs)
        gc = batch["global_crops"].astype(cfg.compute_dtype)   # [2B, S, S, 3]
        lc = batch["local_crops"].astype(cfg.compute_dtype)    # [nl*B, s, s, 3]
        masks = batch["masks"]                                  # [2B, N] bool
        mask_indices = batch["mask_indices"]                    # [U] int32
        masks_weight = batch["masks_weight"]                    # [U] f32 (0 pad)
        mask_valid = masks_weight > 0
        n_masked = batch["n_masked_patches"]                    # scalar

        two_b = gc.shape[0]
        b = two_b // cfg.n_global_crops
        do_ibot = cfg.do_ibot
        n_g_terms = (cfg.n_global_crops - 1) * cfg.n_global_crops
        n_l_terms = max(cfg.n_local_crops * cfg.n_global_crops, 1)

        # ---------------- teacher (no grad) ----------------
        t_out = self._backbone_feats(
            teacher_params["backbone"], gc, None, None, True
        )
        t_cls = t_out["x_norm_clstoken"]                        # [2B, C]
        # crop swap so crop A is matched with crop B (reference :171-173)
        t_cls = jnp.concatenate((t_cls[b:], t_cls[:b]), axis=0)
        t_patch = t_out["x_norm_patchtokens"]                   # [2B, N, C]

        if do_ibot and not cfg.ibot_separate_head:
            flat = t_patch.reshape(-1, t_patch.shape[-1])
            t_masked = flat[mask_indices]                       # [U, C]
            t_buf = jnp.concatenate((t_cls, t_masked), axis=0)
            t_after = self._apply_head("dino_head", teacher_params, t_buf)
            t_cls_after = t_after[:two_b]
            t_patch_after = t_after[two_b:]
        else:
            t_cls_after = self._apply_head("dino_head", teacher_params, t_cls)
            t_patch_after = None
            if do_ibot:
                flat = t_patch.reshape(-1, t_patch.shape[-1])
                t_masked = flat[mask_indices]
                t_patch_after = self._apply_head(
                    "ibot_head", teacher_params, t_masked
                )

        t_cls_after = jax.lax.stop_gradient(t_cls_after)
        if t_patch_after is not None:
            t_patch_after = jax.lax.stop_gradient(t_patch_after)

        if cfg.centering == "centering":
            t_dino_probs = L.softmax_center_teacher(
                t_cls_after, dino_center, teacher_temp
            )
            new_dino_center = L.update_center(
                L.CenterState(dino_center), t_cls_after, cfg.center_momentum
            ).center
            if do_ibot:
                t_ibot_probs = L.softmax_center_teacher(
                    t_patch_after, ibot_center, teacher_temp
                )
                new_ibot_center = L.update_center(
                    L.CenterState(ibot_center),
                    t_patch_after,
                    cfg.center_momentum,
                    weights=mask_valid,
                ).center
            else:
                t_ibot_probs, new_ibot_center = None, ibot_center
        elif cfg.centering == "sinkhorn_knopp":
            t_dino_probs = L.sinkhorn_knopp_teacher(t_cls_after, teacher_temp)
            new_dino_center = dino_center
            if do_ibot:
                t_ibot_probs = L.sinkhorn_knopp_teacher(
                    t_patch_after, teacher_temp, sample_mask=mask_valid
                )
            else:
                t_ibot_probs = None
            new_ibot_center = ibot_center
        else:
            raise NotImplementedError(cfg.centering)

        t_dino_probs = jax.lax.stop_gradient(t_dino_probs)
        # [2, B, K] teacher prob groups (already crop-swapped)
        t_dino_groups = t_dino_probs.reshape(
            cfg.n_global_crops, b, -1
        )

        # ---------------- student ----------------
        s_out_g = self._backbone_feats(
            student_params["backbone"], gc, masks, rngs_g, False
        )
        s_out_l = self._backbone_feats(
            student_params["backbone"], lc, None, rngs_l, False
        )
        s_cls_g = s_out_g["x_norm_clstoken"]                   # [2B, C]
        s_cls_l = s_out_l["x_norm_clstoken"]                   # [nl*B, C]

        pieces = [s_cls_l, s_cls_g]
        if do_ibot and not cfg.ibot_separate_head:
            s_flat = s_out_g["x_norm_patchtokens"].reshape(-1, self.embed_dim)
            s_masked = s_flat[mask_indices]                    # [U, C]
            pieces.append(s_masked)
        packed = jnp.concatenate(pieces, axis=0)
        packed_after = self._apply_head("dino_head", student_params, packed)
        nl_b = s_cls_l.shape[0]
        s_cls_l_after = packed_after[:nl_b]
        s_cls_g_after = packed_after[nl_b : nl_b + two_b]
        if do_ibot and not cfg.ibot_separate_head:
            s_patch_after = packed_after[nl_b + two_b :]
        elif do_ibot:
            s_flat = s_out_g["x_norm_patchtokens"].reshape(-1, self.embed_dim)
            s_patch_after = self._apply_head(
                "ibot_head", student_params, s_flat[mask_indices]
            )
        else:
            s_patch_after = None

        loss_dict = {}
        total = 0.0

        if cfg.n_local_crops > 0:
            local_chunks = list(s_cls_l_after.reshape(cfg.n_local_crops, b, -1))
            dino_local = L.dino_loss(
                local_chunks, list(t_dino_groups), cfg.student_temp
            ) / (n_g_terms + n_l_terms)
            loss_dict["dino_local_crops_loss"] = dino_local
            total = total + cfg.dino_loss_weight * dino_local

        loss_scales = 2.0
        dino_global = (
            L.dino_loss(
                [s_cls_g_after],
                [t_dino_probs],
                cfg.student_temp,
            )
            * loss_scales
            / (n_g_terms + n_l_terms)
        )
        loss_dict["dino_global_crops_loss"] = dino_global
        total = total + cfg.dino_loss_weight * dino_global

        if cfg.koleo_loss_weight > 0:
            if mesh is not None and not cfg.koleo_global:
                koleo_fn = lambda c: L.koleo_loss_per_device(c, mesh)
            else:
                koleo_fn = L.koleo_loss
            koleo = cfg.koleo_loss_weight * sum(
                koleo_fn(chunk)
                for chunk in s_cls_g.reshape(cfg.n_global_crops, b, -1)
            )
            loss_dict["koleo_loss"] = koleo / loss_scales
            total = total + koleo

        if do_ibot:
            ibot = (
                L.ibot_patch_loss_masked(
                    s_patch_after,
                    t_ibot_probs,
                    masks_weight,
                    n_samples=two_b,
                    student_temp=cfg.student_temp,
                )
                * loss_scales
                * (1.0 / cfg.n_global_crops)
            )
            loss_dict["ibot_loss"] = ibot / 2
            total = total + cfg.ibot_loss_weight * ibot

        aux = {
            "loss_dict": loss_dict,
            "dino_center": new_dino_center,
            "ibot_center": new_ibot_center,
        }
        return total, aux

    # ---- train step ---------------------------------------------------------

    def state_shardings(self, state: SSLState, mesh, shard_params: bool = False):
        """SPMD shardings: optimizer moments (and optionally params) over
        the fsdp axis — the FSDP SHARD_GRAD_OP analog; centers replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from octic_vits_tpu.parallel.sharding import (
            replicated_tree, tree_shardings,
        )

        params_sh = (
            tree_shardings(state.student, mesh)
            if shard_params
            else replicated_tree(state.student, mesh)
        )
        rep = NamedSharding(mesh, P())
        return SSLState(
            step=rep,
            student=params_sh,
            teacher=params_sh,
            mu=tree_shardings(state.mu, mesh),
            nu=tree_shardings(state.nu, mesh),
            dino_center=rep,
            ibot_center=rep,
        )

    def batch_shardings(self, mesh):
        """Crops/masks sharded over the whole mesh; the padded masked-token
        buffers are global (gathered) so they stay replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from octic_vits_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

        data = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
        rep = NamedSharding(mesh, P())
        return {
            "global_crops": data,
            "local_crops": data,
            "masks": data,
            "mask_indices": rep,
            "masks_weight": rep,
            "n_masked_patches": rep,
        }

    def make_train_step(self, mesh=None, state_sh=None):
        """Jitted step(state, batch, schedule_scalars, rng) -> (state, metrics).

        schedule_scalars: dict(lr, wd, last_layer_lr, momentum, teacher_temp)
        — computed host-side from the CosineSchedulers and passed as scalars
        (reference: dinov2/train/train.py:253-295). With `mesh` the step is
        jitted with explicit shardings (DP over the mesh + ZeRO-2 moments)."""
        cfg = self.cfg

        def step_fn(state: SSLState, batch, sched, rng):
            rngs = {"dropout": jax.random.fold_in(rng, state.step)}

            def compute(student_params):
                return self.loss_fn(
                    student_params,
                    state.teacher,
                    state.dino_center,
                    state.ibot_center,
                    batch,
                    sched["teacher_temp"],
                    rngs,
                    mesh=mesh,
                )

            (loss, aux), grads = jax.value_and_grad(compute, has_aux=True)(
                state.student
            )

            # per-submodule grad clipping (reference: train.py:280-291)
            def clip_tree(g):
                gn = optax.global_norm(g)
                scale = jnp.minimum(1.0, cfg.clip_grad / (gn + 1e-6))
                return jax.tree.map(lambda x: x * scale, g), gn

            clipped, gnorms = {}, {}
            for k, g in grads.items():
                clipped[k], gnorms[k] = clip_tree(g)
            grads = clipped

            # inline AdamW with per-leaf lr/wd multipliers
            n_blocks = self.backbone.depth
            lr_mult, wd_mult, is_last = build_multiplier_trees(
                state.student,
                num_layers=n_blocks,
                layerwise_decay=cfg.layerwise_decay,
                patch_embed_lr_mult=cfg.patch_embed_lr_mult,
            )
            t = (state.step + 1).astype(jnp.float32)
            b1, b2 = cfg.adamw_beta1, cfg.adamw_beta2
            bc1 = 1.0 - b1**t
            bc2 = 1.0 - b2**t

            def upd(p, g, m, v, lmult, wmult, last):
                g = g.astype(jnp.float32)
                m = b1 * m + (1 - b1) * g
                v = b2 * v + (1 - b2) * g * g
                lr_leaf = (
                    sched["last_layer_lr"] * last + sched["lr"] * (1.0 - last)
                ) * lmult
                step_dir = (m / bc1) / (jnp.sqrt(v / bc2) + 1e-8)
                new_p = p - lr_leaf * (
                    step_dir + sched["wd"] * wmult * p.astype(jnp.float32)
                ).astype(p.dtype)
                return new_p.astype(p.dtype), m, v

            flat_p, treedef = jax.tree.flatten(state.student)
            flat_g = jax.tree.leaves(grads)
            flat_m = jax.tree.leaves(state.mu)
            flat_v = jax.tree.leaves(state.nu)
            flat_lm = jax.tree.leaves(lr_mult)
            flat_wm = jax.tree.leaves(wd_mult)
            flat_ll = jax.tree.leaves(is_last)
            new_p, new_m, new_v = [], [], []
            for p, g, m, v, lm, wm, ll in zip(
                flat_p, flat_g, flat_m, flat_v, flat_lm, flat_wm, flat_ll
            ):
                np_, nm, nv = upd(p, g, m, v, lm, wm, ll)
                new_p.append(np_)
                new_m.append(nm)
                new_v.append(nv)
            new_student = jax.tree.unflatten(treedef, new_p)
            new_mu = jax.tree.unflatten(treedef, new_m)
            new_nu = jax.tree.unflatten(treedef, new_v)

            # teacher EMA (reference: ssl_meta_arch.py:370-379)
            m_t = sched["momentum"]
            new_teacher = jax.tree.map(
                lambda te, st: m_t * te + (1.0 - m_t) * st.astype(te.dtype),
                state.teacher,
                new_student,
            )

            new_state = SSLState(
                step=state.step + 1,
                student=new_student,
                teacher=new_teacher,
                mu=new_mu,
                nu=new_nu,
                dino_center=aux["dino_center"],
                ibot_center=aux["ibot_center"],
            )
            metrics = dict(aux["loss_dict"])
            metrics["total_loss"] = loss
            for k, gn in gnorms.items():
                metrics[f"grad_norm/{k}"] = gn
            return new_state, metrics

        if mesh is None:
            return step_fn
        assert state_sh is not None
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(state_sh, self.batch_shardings(mesh), rep, rep),
            out_shardings=(state_sh, rep),
        )
