from .tsv import read_tsv_docs  # noqa: F401
