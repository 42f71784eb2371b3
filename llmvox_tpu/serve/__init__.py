from llmvox_tpu.serve.engine import TTSEngine
from llmvox_tpu.serve.scheduler import StreamingScheduler
