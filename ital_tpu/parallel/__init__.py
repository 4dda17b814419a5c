"""Device-mesh parallelism: sharded corpus, collective MI scan, ICI reductions."""

from ital_tpu.parallel.bigcap import (  # noqa: F401
    make_bigcap_fit,
    make_bigcap_round,
    shard_state_bigcap,
)
from ital_tpu.parallel.chol2d import (  # noqa: F401
    make_sharded_cho_solve,
    make_sharded_cholesky,
    make_sharded_whiten,
)
from ital_tpu.parallel.interactive import ShardedRetrieval  # noqa: F401
from ital_tpu.parallel.mesh import make_mesh  # noqa: F401
from ital_tpu.parallel.sharded import (  # noqa: F401
    LearnConfig,
    make_sharded_cohort,
    make_sharded_cohort_select,
    make_sharded_cohort_update,
    make_sharded_density,
    make_sharded_fit,
    make_sharded_round,
    make_sharded_select,
    make_sharded_session,
    make_sharded_set_query,
    make_sharded_update,
    pad_to_devices,
    shard_cohort_state,
    shard_state,
)
