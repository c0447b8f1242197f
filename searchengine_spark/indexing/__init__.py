from .docids import with_doc_ids, with_doc_ids_window  # noqa: F401
from .build import Bm25Params, IndexTables, build_index  # noqa: F401
