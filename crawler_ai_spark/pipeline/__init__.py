"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the large-scale corpus-preparation layer that a
100 TB crawl feeds. All DataFrame-native; Python only inside Arrow-batched
pandas UDFs (SimHash signatures, media decode stubs)."""
