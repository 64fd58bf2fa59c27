from jcf_tpu.tokenizer.bpe import SimpleTokenizer, get_tokenizer
from jcf_tpu.tokenizer.tokenize import tokenize, SOT_TOKEN, EOT_TOKEN, CONTEXT_LENGTH

__all__ = [
    "SimpleTokenizer",
    "get_tokenizer",
    "tokenize",
    "SOT_TOKEN",
    "EOT_TOKEN",
    "CONTEXT_LENGTH",
]
