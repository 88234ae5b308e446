"""CDC ingest core: the reference pipeline's actual surface, rebuilt
Spark-first (parse → type-recover → project → latest-state → sink)."""
