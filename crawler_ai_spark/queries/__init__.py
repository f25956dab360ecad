"""Query-catalog family modules. Importing a module registers its
queries/oracles into the shared registries (queries/_shared.py);
crawler_ai_spark/catalog.py imports them in the canonical order and
re-exports QUERIES/ORACLES — external consumers keep importing from
catalog, unchanged."""
