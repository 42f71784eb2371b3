from llmvox_tpu.ops import nn
from llmvox_tpu.ops.istft import istft_same
