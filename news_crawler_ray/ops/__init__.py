"""Training-data operators: dedup, similarity search, text analysis,
multimodal plumbing — the large-scale pipeline ops beyond the reference's
own inventory (SURVEY.md §2), each designed batch-vectorized for Ray Data.
"""
