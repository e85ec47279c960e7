"""Large-scale training-data pipeline operators (BASELINE.json north
star): deduplication, similarity search, multimodal column plumbing,
text analysis. All partition-first designs — no driver-side loops over
data, no row-at-a-time Python in hot paths."""
