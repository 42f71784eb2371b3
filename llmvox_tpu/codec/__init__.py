from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.codec.vq import codes_to_features
