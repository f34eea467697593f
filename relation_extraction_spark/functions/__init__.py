from .tokenizer import have_chinese, is_chinese, tokenize_with_offsets  # noqa: F401
