from .text import tokens_col, hash60  # noqa: F401
