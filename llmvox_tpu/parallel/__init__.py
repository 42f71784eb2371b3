from llmvox_tpu.parallel.mesh import create_mesh, initialize_distributed
from llmvox_tpu.parallel.sharding import (
    batch_sharding,
    decoder_param_shardings,
    replicated,
)
