"""Analytical query surface — SURVEY.md §2.9 uplift (groupBy/window/rollup).

Populated in build step 7.
"""
