"""Incremental ingest: merge-on-srn upsert, delta postings, tombstones."""
