from llmvox_tpu.text.byt5 import ByT5Tokenizer
from llmvox_tpu.text.cleaning import clean_text
