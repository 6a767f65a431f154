from octic_vits_tpu.parallel.mesh import (
    DATA_AXIS,
    FSDP_AXIS,
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    replicated,
)
from octic_vits_tpu.parallel.sharding import (
    leaf_partition_spec,
    replicated_tree,
    tree_shardings,
)
