from .iceberg_sink import publish_index_iceberg, write_stage  # noqa: F401
from .transcripts import read_transcripts  # noqa: F401
from .tsv import read_tsv_docs  # noqa: F401
