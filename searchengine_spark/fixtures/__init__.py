from .transcripts import (  # noqa: F401
    REFERENCE_QUERIES,
    generate_transcripts_pdf,
    transcripts_df,
    TRANSCRIPTS_SCHEMA,
)
