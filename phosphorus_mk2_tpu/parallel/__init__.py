"""SPMD parallelism: device meshes, wavefront sharding, film gather,
multi-host init + comm accounting."""
from phosphorus_mk2_tpu.parallel.distributed import (  # noqa: F401
    comm_accounting,
    initialize,
    make_render_mesh,
    replicated_sharding,
    wave_sharding,
    wave_spec,
)
from phosphorus_mk2_tpu.parallel.sharding import (  # noqa: F401
    gather_film,
    make_sharded_render,
    make_wave_mesh,
    shard_pixels,
)
