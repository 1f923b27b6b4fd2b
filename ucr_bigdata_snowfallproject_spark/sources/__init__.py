"""Non-parquet sources: GSOD fixed-text parsing (S4/S5/S6) and the tar
archive reader (S3) — the reference's ingest surface (SURVEY §2.1)."""
