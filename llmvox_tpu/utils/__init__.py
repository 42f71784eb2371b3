from llmvox_tpu.utils.config import (
    DecoderConfig,
    CodecConfig,
    ServeConfig,
    TrainConfig,
    apply_cli_overrides,
)
