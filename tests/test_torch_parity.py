"""Torch-oracle parity: run the ACTUAL reference implementation
(/root/reference, PyTorch on CPU, timm/triton stubbed — see _torch_ref.py)
and assert the converted flax modules/models reproduce its outputs.

This is the fidelity gate for utils/convert.py: layer-by-layer parity for
every equivariant layer and whole-model parity for hybrid + inv-early DeiT
style and the DINOv2-style model (reference: octic_vits/d8_layers.py,
octic_vits/model.py:25-235, octic_vits/dinov2_models.py:41-198).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _torch_ref import load_reference, state_dict_numpy  # noqa: E402

ATOL = 1e-5


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _rand5(b, n, c, seed=0):
    """Random isotypic 5-tuple as torch tensors (fp32)."""
    g = torch.Generator().manual_seed(seed)
    return (
        torch.randn(b, n, c // 8, generator=g),
        torch.randn(b, n, c // 8, generator=g),
        torch.randn(b, n, c // 8, generator=g),
        torch.randn(b, n, c // 8, generator=g),
        torch.randn(b, n, 2, c // 4, generator=g),
    )


def _to_j5(xs):
    return tuple(jnp.asarray(x.detach().numpy()) for x in xs)


def _assert_close5(ours, theirs, atol=ATOL, msg=""):
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(ours[i]), theirs[i].detach().numpy(),
            atol=atol, rtol=1e-5, err_msg=f"{msg} slot {i}",
        )


def _prefixed(module):
    """state_dict with an 'm.' prefix so the convert.py helpers apply."""
    return {"m." + k: v for k, v in state_dict_numpy(module).items()}


def _jparams(tree):
    return jax.tree.map(jnp.asarray, tree)


# ---------------------------------------------------------------- layers


def test_linear_d8_parity(ref):
    from octic_vits_tpu.layers.d8_layers import LinearD8
    from octic_vits_tpu.utils.convert import _linear_d8

    c_in, c_out = 64, 128
    t = ref.d8_layers.LinearD8(c_in, c_out, bias=True).eval()
    xs = _rand5(2, 7, c_in)
    with torch.no_grad():
        want = t(xs)
    params = _jparams(_linear_d8(_prefixed(t), "m", True))
    got = LinearD8(features=c_out).apply({"params": params}, _to_j5(xs))
    _assert_close5(got, want, msg="LinearD8")


def test_layernorm_d8_parity(ref):
    from octic_vits_tpu.layers.d8_layers import LayerNormD8
    from octic_vits_tpu.utils.convert import _norm_d8

    c = 64
    t = ref.d8_layers.LayerNormD8(c).eval()
    # non-trivial affine params (reference inits scale=1)
    with torch.no_grad():
        for p in t.parameters():
            p.copy_(torch.randn_like(p))
    xs = _rand5(2, 7, c, seed=1)
    with torch.no_grad():
        want = t(xs)
    params = _jparams(_norm_d8(_prefixed(t), "m"))
    got = LayerNormD8().apply({"params": params}, _to_j5(xs))
    _assert_close5(got, want, msg="LayerNormD8")


def test_attention_d8_parity(ref):
    from octic_vits_tpu.layers.d8_layers import AttentionD8
    from octic_vits_tpu.utils.convert import _linear_d8

    c, heads = 128, 2  # head_dim 64 (div by 8)
    t = ref.d8_layers.AttentionD8(c, num_heads=heads, qkv_bias=True).eval()
    xs = _rand5(2, 9, c, seed=2)
    with torch.no_grad():
        want = t(xs)
    sd = _prefixed(t)
    params = _jparams({
        "qkv": _linear_d8(sd, "m.qkv", True),
        "proj": _linear_d8(sd, "m.proj", True),
    })
    got = AttentionD8(num_heads=heads, qkv_bias=True).apply(
        {"params": params}, _to_j5(xs)
    )
    _assert_close5(got, want, msg="AttentionD8")


def test_mlp_d8_parity(ref):
    from octic_vits_tpu.layers.d8_layers import MlpD8
    from octic_vits_tpu.utils.convert import _linear_d8

    c = 64
    t = ref.d8_layers.MlpD8(
        in_features=c, hidden_features=2 * c,
        act_layer=ref.d8_layers.TritonGeluD8,  # patched to eager GeluD8
    ).eval()
    xs = _rand5(2, 7, c, seed=3)
    with torch.no_grad():
        want = t(xs)
    sd = _prefixed(t)
    params = _jparams({
        "fc1": _linear_d8(sd, "m.fc1", True),
        "fc2": _linear_d8(sd, "m.fc2", True),
    })
    got = MlpD8(hidden_features=2 * c).apply({"params": params}, _to_j5(xs))
    _assert_close5(got, want, msg="MlpD8")


@pytest.mark.parametrize("style", ["deit", "dinov2"])
def test_octic_block_parity(ref, style):
    from octic_vits_tpu.layers.d8_layers import BlockD8
    from octic_vits_tpu.utils.convert import _octic_block

    c, heads = 128, 2
    if style == "deit":
        t = ref.d8_layers.Layer_scale_init_BlockD8(
            dim=c, num_heads=heads, qkv_bias=True,
            norm_layer=ref.d8_layers.LayerNormD8,
            act_layer=ref.d8_layers.TritonGeluD8,
            init_values=1e-4,
        ).eval()
    else:
        t = ref.d8_layers.BlockD8(
            dim=c, num_heads=heads, qkv_bias=True,
            norm_layer=ref.d8_layers.LayerNormD8,
            act_layer=ref.d8_layers.TritonGeluD8,
            init_values=1e-5,
        ).eval()
    # layerscale init values are tiny; randomize them so parity is nontrivial
    with torch.no_grad():
        for name, p in t.named_parameters():
            if "gamma" in name or "ls" in name:
                p.copy_(0.1 * torch.randn_like(p))
    xs = _rand5(2, 9, c, seed=4)
    with torch.no_grad():
        want = t(xs)
    params = _jparams(_octic_block(_prefixed(t), "m", style))
    got = BlockD8(num_heads=heads, qkv_bias=True, layerscale_init=1e-4).apply(
        {"params": params}, _to_j5(xs)
    )
    _assert_close5(got, want, msg=f"BlockD8[{style}]")


def test_patch_embed_d8_parity(ref):
    from octic_vits_tpu.layers.d8_layers import PatchEmbedD8
    from octic_vits_tpu.utils.convert import convert_octic_vit

    c, patch, img = 64, 8, 32
    t = ref.d8_layers.PatchEmbedD8(
        img_size=img, patch_size=patch, in_chans=3, embed_dim=c
    ).eval()
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, 3, img, img, generator=g)
    with torch.no_grad():
        want = t(x)
    sd = {"patch_embed." + k: v for k, v in state_dict_numpy(t).items()}
    from octic_vits_tpu.utils.convert import _conv
    params = _jparams({
        "w_a1": _conv(sd["patch_embed.lift8.conv_A1.weight"]),
        "w_a2": _conv(sd["patch_embed.lift8.conv_A2.weight"]),
        "w_b1": _conv(sd["patch_embed.lift8.conv_B1.weight"]),
        "w_b2": _conv(sd["patch_embed.lift8.conv_B2.weight"]),
        "w_e_left": _conv(sd["patch_embed.lift8.conv_E_left.weight"]),
        "w_e_right": _conv(sd["patch_embed.lift8.conv_E_right.weight"]),
        "bias_a1": sd["patch_embed.lift8.conv_A1.bias"],
    })
    got = PatchEmbedD8(patch_size=patch, embed_dim=c).apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    _assert_close5(got, want, msg="PatchEmbedD8")


def test_posembed_unfold_parity(ref):
    from octic_vits_tpu.d8.posembed import unfold_quadrant

    g = torch.Generator().manual_seed(6)
    xs = tuple(torch.randn(3, 3, 8, generator=g) for _ in range(6))
    want = ref.d8_utils.isotypic_dim_interpolation(xs, dim=0)
    got = unfold_quadrant(tuple(jnp.asarray(x.numpy()) for x in xs), dim=0)
    for i in range(8):
        np.testing.assert_allclose(
            np.asarray(got[i]), want[i].numpy(), atol=ATOL,
            err_msg=f"unfold slot {i}",
        )


def test_isotypic_to_patch_parity(ref):
    """IsotypicToPatchD8 (inverse lift) vs the reference
    (octic_vits/d8_layers.py:499-588)."""
    from octic_vits_tpu.layers.d8_layers import IsotypicToPatchD8
    from octic_vits_tpu.utils.convert import _linear_d8

    c, patch = 64, 4
    torch.manual_seed(0)
    t = ref.d8_layers.IsotypicToPatchD8(
        c, patch_side=patch, out_channels=3, bias=True
    ).eval()
    xs = _rand5(2, 9, c, seed=20)
    with torch.no_grad():
        want = t(xs)
    params = _jparams({"lin8": _linear_d8(_prefixed(t), "m.lin8", True)})
    got = IsotypicToPatchD8(patch_side=patch, out_channels=3).apply(
        {"params": params}, _to_j5(xs)
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("kind", ["non_invariant", "linear", "polynomial", "third_order"])
def test_paramfree_invariants_parity(ref, kind):
    """The param-free research invariants vs the reference
    (octic_vits/d8_invariantization.py:29-141)."""
    from octic_vits_tpu.layers.invariants import INVARIANTS

    c = 64
    ref_cls = {
        "non_invariant": ref.d8_inv.NonInvariant,
        "linear": ref.d8_inv.LinearInvariant,
        "polynomial": ref.d8_inv.PolynomialInvariant,
        "third_order": ref.d8_inv.ThirdOrderInvariant,
    }[kind]
    t = ref_cls(c)
    xs = _rand5(2, 7, c, seed=21)
    with torch.no_grad():
        want = t(xs)
    mod = INVARIANTS[kind](dim=c)
    got = mod.apply({}, _to_j5(xs))
    assert mod.output_dim == want.shape[-1]
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4, err_msg=kind
    )


@pytest.mark.parametrize("kind", ["max_filtering", "canonization"])
def test_learned_invariants_parity(ref, kind):
    """MaxFiltering / Canonization invariants on COPIED reference
    parameters (octic_vits/d8_invariantization.py:142-280)."""
    from octic_vits_tpu.layers.invariants import INVARIANTS

    c = 64
    torch.manual_seed(3)
    if kind == "max_filtering":
        t = ref.d8_inv.MaxFilteringInvariant(c).eval()
        params = {"references": t.references.detach().numpy()}
    else:
        t = ref.d8_inv.CanonizationInvariant(c).eval()
        params = {"reference": t.reference.detach().numpy()}
    xs = _rand5(2, 7, c, seed=22)
    with torch.no_grad():
        want = t(xs)
    mod = INVARIANTS[kind](dim=c)
    got = mod.apply({"params": _jparams(params)}, _to_j5(xs))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4, err_msg=kind
    )


def test_power_spectrum_invariant_parity(ref):
    from octic_vits_tpu.layers.invariants import PowerSpectrumInvariant

    c = 64
    t = ref.d8_inv.PowerSpectrumInvariant(c)
    xs = _rand5(2, 7, c, seed=7)
    with torch.no_grad():
        want = t(xs)
    got = PowerSpectrumInvariant(dim=c).apply({}, _to_j5(xs))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=ATOL, err_msg="PowerSpectrum"
    )


# ---------------------------------------------------------------- models


def _ref_deit_model(ref, invariant, **kw):
    torch.manual_seed(0)
    return ref.model.OcticVisionTransformer(
        img_size=32, patch_size=8, in_chans=3, num_classes=10, embed_dim=64,
        depth=4, num_heads=2, mlp_ratio=4.0, qkv_bias=True,
        invariant=invariant,
        octic_block_layers=ref.d8_layers.Layer_scale_init_BlockD8,
        standard_block_layers=ref.deit_vit.Layer_scale_init_Block,
        **kw,
    ).eval()


@pytest.mark.parametrize("invariant", [False, True],
                         ids=["hybrid", "inv_early"])
def test_deit_model_parity(ref, invariant):
    from octic_vits_tpu.models import OcticVisionTransformer
    from octic_vits_tpu.utils.convert import convert_octic_vit

    t = _ref_deit_model(ref, invariant)
    g = torch.Generator().manual_seed(8)
    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        want = t(x).numpy()
    params = _jparams(convert_octic_vit(
        state_dict_numpy(t), depth=4, style="deit"
    ))
    model = OcticVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, num_classes=10, invariant=invariant,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def _ref_dinov2_model(ref):
    torch.manual_seed(0)
    m = ref.dinov2_models.OcticDinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4.0,
    ).eval()
    # randomize the zero-init cls/mask tokens so parity is nontrivial
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        m.cls_token[0].copy_(torch.randn_like(m.cls_token[0], ) * 0
                             + torch.randn(m.cls_token[0].shape, generator=g))
        m.mask_token[0].copy_(torch.randn(m.mask_token[0].shape, generator=g))
    return m


def test_dinov2_model_parity(ref):
    from octic_vits_tpu.models import OcticDinoVisionTransformer
    from octic_vits_tpu.utils.convert import convert_octic_vit

    t = _ref_dinov2_model(ref)
    g = torch.Generator().manual_seed(9)
    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        want = t.forward_features(x)
    params = _jparams(convert_octic_vit(
        state_dict_numpy(t), depth=4, style="dinov2"
    ))
    model = OcticDinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4.0, init_scale=1e-4,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        method=model.forward_features,
    )
    for key in ("x_norm_clstoken", "x_norm_patchtokens"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=2e-5, rtol=1e-5,
            err_msg=key,
        )


def test_standard_vit_model_parity(ref):
    """deit/vit.py `vit_models` with Layer_scale_init_Block vs
    VisionTransformer + convert_standard_vit (reference: deit/vit.py:256)."""
    from octic_vits_tpu.models import VisionTransformer
    from octic_vits_tpu.utils.convert import convert_standard_vit

    torch.manual_seed(0)
    t = ref.deit_vit.vit_models(
        img_size=32, patch_size=8, num_classes=10, embed_dim=64, depth=3,
        num_heads=2, mlp_ratio=4.0, qkv_bias=True,
        block_layers=ref.deit_vit.Layer_scale_init_Block,
    ).eval()
    g = torch.Generator().manual_seed(11)
    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        want = t(x).numpy()
    params = _jparams(convert_standard_vit(state_dict_numpy(t), depth=3))
    model = VisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=3, num_heads=2,
        mlp_ratio=4.0, qkv_bias=True, num_classes=10,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("ffn,n_reg", [("mlp", 0), ("swiglufused", 4)],
                         ids=["mlp", "swiglu_reg"])
def test_upstream_dinov2_backbone_parity(ref, ffn, n_reg):
    """Upstream standard DinoVisionTransformer (dinov2/models/
    vision_transformer.py, hub checkpoint layout block_chunks=0) vs
    convert_dinov2_vit + my DinoVisionTransformer — incl. the giant's
    fused-SwiGLU FFN and register tokens."""
    import dinov2.models.vision_transformer as dvt

    from octic_vits_tpu.models import DinoVisionTransformer
    from octic_vits_tpu.utils.convert import convert_dinov2_vit

    torch.manual_seed(0)
    t = dvt.DinoVisionTransformer(
        img_size=28, patch_size=14, embed_dim=64, depth=3, num_heads=2,
        mlp_ratio=4.0, init_values=1.0, ffn_layer=ffn, block_chunks=0,
        num_register_tokens=n_reg,
    ).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        t.cls_token.copy_(torch.randn(t.cls_token.shape, generator=g))
        t.mask_token.copy_(torch.randn(t.mask_token.shape, generator=g))
        if n_reg:
            t.register_tokens.copy_(
                torch.randn(t.register_tokens.shape, generator=g)
            )
    g = torch.Generator().manual_seed(12)
    x = torch.randn(2, 3, 28, 28, generator=g)
    with torch.no_grad():
        want = t.forward_features(x)
    params = _jparams(convert_dinov2_vit(state_dict_numpy(t), depth=3))
    model = DinoVisionTransformer(
        img_size=28, patch_size=14, embed_dim=64, depth=3, num_heads=2,
        mlp_ratio=4.0, layerscale_init=1.0,
        ffn_layer="swiglu" if ffn == "swiglufused" else "mlp",
        num_register_tokens=n_reg,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        method=model.forward_features,
    )
    for key in ("x_norm_clstoken", "x_norm_patchtokens"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=2e-5, rtol=1e-5,
            err_msg=key,
        )


def test_linear_classifier_wrapper_parity(ref, tmp_path):
    """hub.load_linear_classifier vs the reference _LinearClassifierWrapper
    (dinov2/hub/classifiers.py:52-84, layers=4)."""
    import dinov2.models.vision_transformer as dvt

    from octic_vits_tpu import hub as jhub
    from octic_vits_tpu.hub import HUB_ENTRIES, HubEntry, load_linear_classifier

    torch.manual_seed(0)
    t = dvt.DinoVisionTransformer(
        img_size=28, patch_size=14, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4.0, init_values=1.0, block_chunks=0,
    ).eval()
    head = torch.nn.Linear(5 * 64, 1000)
    torch.save(t.state_dict(), tmp_path / "backbone.pth")
    torch.save(head.state_dict(), tmp_path / "head.pth")

    # reference wrapper forward (layers=4)
    g = torch.Generator().manual_seed(13)
    x = torch.randn(2, 3, 28, 28, generator=g)
    with torch.no_grad():
        outs = t.get_intermediate_layers(x, n=4, return_class_token=True)
        feats = torch.cat(
            [outs[0][1], outs[1][1], outs[2][1], outs[3][1],
             outs[3][0].mean(dim=1)], dim=1)
        want = head(feats).numpy()

    name = "_test_dinov2_tiny14"
    HUB_ENTRIES[name] = HubEntry(name, 4, "dinov2", 14,
                                 family="dinov2_std", embed_dim=64)
    from octic_vits_tpu.models.registry import register_model

    from octic_vits_tpu.models import DinoVisionTransformer

    @register_model
    def _test_dinov2_tiny14(img_size=28, **kw):
        kw.setdefault("layerscale_init", 1.0)
        return DinoVisionTransformer(
            img_size=img_size, patch_size=14, embed_dim=64, depth=4,
            num_heads=2, mlp_ratio=4.0, **kw,
        )

    classify_fn, variables = load_linear_classifier(
        name, str(tmp_path / "backbone.pth"), str(tmp_path / "head.pth"),
        layers=4, img_size=28, dtype=jnp.float32,
    )
    got = classify_fn(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_dinov2_model_masked_parity(ref):
    from octic_vits_tpu.models import OcticDinoVisionTransformer
    from octic_vits_tpu.utils.convert import convert_octic_vit

    t = _ref_dinov2_model(ref)
    g = torch.Generator().manual_seed(10)
    x = torch.randn(2, 3, 32, 32, generator=g)
    n = (32 // 8) ** 2
    masks = torch.zeros(2, n, dtype=torch.bool)
    masks[0, ::3] = True
    masks[1, 1::4] = True
    with torch.no_grad():
        want = t.forward_features(x, masks=masks)
    params = _jparams(convert_octic_vit(
        state_dict_numpy(t), depth=4, style="dinov2"
    ))
    model = OcticDinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=2,
        mlp_ratio=4.0, init_scale=1e-4,
    )
    got = model.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(masks.numpy()), method=model.forward_features,
    )
    for key in ("x_norm_clstoken", "x_norm_patchtokens"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=2e-5, rtol=1e-5,
            err_msg="masked " + key,
        )
