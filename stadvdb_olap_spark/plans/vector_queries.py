"""Similarity-search catalog queries over `embeddings`.

Populated in build step 8.
"""
