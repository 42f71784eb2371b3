from llmvox_tpu.models.decoder import (
    DecodeState,
    apply_decoder,
    decode_block,
    init_decode_state,
    init_decoder_params,
)
