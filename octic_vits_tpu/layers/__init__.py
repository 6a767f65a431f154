from octic_vits_tpu.layers.d8_layers import (
    AttentionD8,
    BlockD8,
    DropoutD8,
    DropPathD8,
    GeluD8,
    IsotypicToPatchD8,
    LayerNormD8,
    LinearD8,
    MlpD8,
    PatchEmbedD8,
    ScaleD8,
)
from octic_vits_tpu.layers.invariants import (
    INVARIANTS,
    CanonizationInvariant,
    LinearInvariant,
    MaxFilteringInvariant,
    NonInvariant,
    PolynomialInvariant,
    PowerSpectrumInvariant,
    ThirdOrderInvariant,
)
from octic_vits_tpu.layers.vit_layers import (
    Attention,
    Block,
    DropPath,
    Mlp,
    PatchEmbed,
    SwiGLUFFN,
)
