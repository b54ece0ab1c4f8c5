"""Source/sink plumbing (SURVEY.md §2.1): binary-document extraction
(PDF, Excel), JDBC-style sinks with idempotent append, and multimodal
binary columns. Heavy third-party document libraries (fitz, tabula,
openpyxl) are NOT in the runtime image — every extractor is pluggable
with a deterministic fallback so the Spark-side plumbing (binaryFile
scan, Arrow batching, schema, partitioning) is real and tested while the
library-specific decode is import-guarded."""
