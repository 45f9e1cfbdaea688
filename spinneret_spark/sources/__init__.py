"""Corpus/vocabulary loaders and the synthetic corpus generator."""
