from llmvox_tpu.streams.protocol import TextStream, aiter_stream
from llmvox_tpu.streams.scripted import ScriptedStream
