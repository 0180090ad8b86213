"""Text-analysis & dedup catalog queries over `documents`.

Populated in build step 8.
"""
