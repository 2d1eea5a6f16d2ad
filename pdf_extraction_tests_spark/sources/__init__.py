"""Document sources: binary files, directory scans, parquet tables."""
