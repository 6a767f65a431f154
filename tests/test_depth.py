"""Depth stack parity vs the reference torch implementation.

Runs the ACTUAL reference hub depth heads (/root/reference/dinov2/hub/
depth/decode_heads.py, torch CPU) with random weights, converts the
state_dict with convert_depth_head, and asserts the flax heads match.
Also pins the resize/BlockExpand primitives to their torch equivalents
and smoke-tests the DepthEncoderDecoder drivers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from octic_vits_tpu.models.depth import (  # noqa: E402
    BlockExpand, BNHead, DepthEncoderDecoder, DPTHead, center_padding,
    resize_bilinear,
)
from octic_vits_tpu.utils.convert import convert_depth_head  # noqa: E402

pytestmark = pytest.mark.slow  # heavyweight lane; quick lane: -m "not slow"


def _ref_decode_heads():
    import sys

    sys.path.insert(0, "/root/reference")
    from dinov2.hub.depth import decode_heads

    return decode_heads


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_matches_torch(align_corners):
    x = np.random.RandomState(0).randn(2, 7, 9, 3).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(13, 5),
        mode="bilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), (13, 5), align_corners))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_block_expand_matches_conv_transpose():
    """BlockExpand == ConvTranspose2d for kernel == stride (the DPT
    reassemble upsamplers, reference decode_heads.py:558-571)."""
    rs = np.random.RandomState(1)
    for s in (2, 4):
        tconv = torch.nn.ConvTranspose2d(6, 5, kernel_size=s, stride=s)
        x = rs.randn(2, 6, 4, 3).astype(np.float32)
        want = tconv(torch.from_numpy(x)).detach().numpy()
        mod = BlockExpand(5, s)
        params = {
            "kernel": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 0, 1)
            ),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = mod.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )


def _rand_features(rs, n, b, hw, dim):
    """[(patch [b,hw,hw,dim], cls [b,dim])], plus the torch-layout copy."""
    jx, tx = [], []
    for _ in range(n):
        p = rs.randn(b, hw, hw, dim).astype(np.float32)
        c = rs.randn(b, dim).astype(np.float32)
        jx.append((jnp.asarray(p), jnp.asarray(c)))
        tx.append(
            (torch.from_numpy(p.transpose(0, 3, 1, 2)), torch.from_numpy(c))
        )
    return jx, tx


def test_bnhead_parity():
    dh = _ref_decode_heads()
    dim, n_levels = 16, 4
    ref = dh.BNHead(
        classify=True, n_bins=32, bins_strategy="UD", norm_strategy="linear",
        upsample=4, in_channels=[dim] * n_levels,
        in_index=list(range(n_levels)), input_transform="resize_concat",
        channels=dim * n_levels * 2, align_corners=False,
        min_depth=0.001, max_depth=80, loss_decode=(),
    ).eval()
    rs = np.random.RandomState(2)
    jx, tx = _rand_features(rs, n_levels, 2, 5, dim)
    with torch.no_grad():
        want = ref.forward(tx).numpy()  # [B, 1, H, W]

    params = convert_depth_head(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    head = BNHead(in_index=tuple(range(n_levels)), upsample=4, n_bins=32,
                  min_depth=0.001, max_depth=80.0)
    got = np.asarray(head.apply({"params": jax.tree.map(jnp.asarray, params)},
                                jx))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-4
    )


def test_dpthead_parity():
    dh = _ref_decode_heads()
    dim = 16
    ref = dh.DPTHead(
        in_channels=[dim] * 4, channels=24, embed_dims=dim,
        post_process_channels=[dim // 2 ** (3 - i) for i in range(4)],
        readout_type="project", min_depth=0.001, max_depth=10,
        loss_decode=(),
    ).eval()
    rs = np.random.RandomState(3)
    jx, tx = _rand_features(rs, 4, 2, 4, dim)
    with torch.no_grad():
        want = ref.forward(tx, None).numpy()

    params = convert_depth_head(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    head = DPTHead(embed_dim=dim, channels=24, min_depth=0.001,
                   max_depth=10.0)
    got = np.asarray(head.apply({"params": jax.tree.map(jnp.asarray, params)},
                                jx))
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, atol=1e-4, rtol=1e-4
    )


def test_center_padding():
    x = jnp.ones((1, 30, 33, 3))
    y = center_padding(x, 14)
    assert y.shape == (1, 42, 42, 3)
    # centered: pad splits (6,6) for H and (4,5) for W
    assert float(y[0, 5, 20, 0]) == 0.0 and float(y[0, 6, 20, 0]) == 1.0
    assert float(y[0, 20, 3, 0]) == 0.0 and float(y[0, 20, 4, 0]) == 1.0


def _toy_depther(dim=8, patch=4):
    head = BNHead(in_index=(0,), upsample=4, n_bins=8, min_depth=0.001,
                  max_depth=80.0)

    def backbone_apply(params, images):
        b, h, w, _ = images.shape
        gh, gw = h // patch, w // patch
        patchmap = jnp.mean(
            images.reshape(b, gh, patch, gw, patch, 3), axis=(2, 4)
        )
        patchmap = jnp.tile(patchmap, (1, 1, 1, dim // 3 + 1))[..., :dim]
        return [(patchmap, jnp.mean(patchmap, axis=(1, 2)))]

    fake = backbone_apply(None, jnp.zeros((1, 16, 16, 3)))
    head_params = head.init(jax.random.PRNGKey(0), fake)["params"]
    depther = DepthEncoderDecoder(
        backbone_apply, head, patch_size=patch, min_depth=0.001,
        max_depth=10.0,
    )
    return depther, {"backbone": None, "head": head_params}


def test_encoder_decoder_whole_and_slide():
    depther, variables = _toy_depther()
    img = jnp.asarray(
        np.random.RandomState(4).rand(2, 20, 26, 3).astype(np.float32)
    )
    whole = depther.predict(variables, img)  # center-pads to 20x28
    assert whole.shape == (2, 20, 26, 1)
    assert float(jnp.min(whole)) >= 0.001 - 1e-6
    assert float(jnp.max(whole)) <= 10.0 + 1e-6

    slid = depther.predict(
        variables, img, mode="slide", stride=(8, 8), crop_size=(16, 16)
    )
    assert slid.shape == (2, 20, 26, 1)
    # flip TTA flips the width axis
    flipped = depther.predict(variables, img, flip=True)
    np.testing.assert_allclose(
        np.asarray(flipped), np.asarray(whole)[:, :, ::-1], atol=1e-6
    )


def test_load_depther_smoke():
    """Hub glue end-to-end with a random-init small backbone + both heads
    (reference: dinov2/hub/depthers.py dinov2_vits14_ld / _dd)."""
    from octic_vits_tpu.hub import load_depther

    for head_type in ("linear", "dpt"):
        depther, variables = load_depther(
            "dinov2_vits14", head_type=head_type, img_size=56,
        )
        model, params = None, variables["backbone"]
        if params is None:
            # random-init backbone for the smoke
            from octic_vits_tpu.hub import load_backbone

            model, _ = load_backbone("dinov2_vits14", img_size=56,
                                     dtype=jnp.float32)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3))
            )["params"]
            variables = {**variables, "backbone": params}
        out = depther.predict(
            variables, jnp.zeros((1, 56, 56, 3), jnp.float32)
        )
        assert out.shape == (1, 56, 56, 1)
        assert np.isfinite(np.asarray(out)).all()
