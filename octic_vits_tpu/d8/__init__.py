"""D8 group algebra core (pure JAX, no parameters)."""

from octic_vits_tpu.d8.group import (
    GROUP_ELEMENTS,
    IRREPS,
    MULT_TABLE,
    SQRT2,
    SQRT2_OVER_2,
    SQRT2_OVER_4,
    image_space_group_action,
    isotypic_group_action,
    isotypic_to_regular,
    isotypic_to_regular_dense,
    pack_8_to_5,
    regular_group_action,
    regular_to_isotypic,
    regular_to_isotypic_dense,
    spatial_and_isotypic_group_action,
    unpack_5_to_8,
)
from octic_vits_tpu.d8.posembed import resize_grid, resize_posembed, unfold_quadrant

__all__ = [
    "GROUP_ELEMENTS",
    "IRREPS",
    "MULT_TABLE",
    "SQRT2",
    "SQRT2_OVER_2",
    "SQRT2_OVER_4",
    "image_space_group_action",
    "isotypic_group_action",
    "isotypic_to_regular",
    "isotypic_to_regular_dense",
    "pack_8_to_5",
    "regular_group_action",
    "regular_to_isotypic",
    "regular_to_isotypic_dense",
    "spatial_and_isotypic_group_action",
    "unpack_5_to_8",
]
