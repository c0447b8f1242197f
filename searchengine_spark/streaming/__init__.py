from .incremental import append_batch, stream_append  # noqa: F401
