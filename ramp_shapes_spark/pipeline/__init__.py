"""KG-construction pipeline: transcripts → mentions → frame → flatten →
canonicalize → materialized triple tables with lineage manifests."""
