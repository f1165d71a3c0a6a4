"""Large-scale training-data operators (dedup, similarity, text analysis,
multimodal plumbing) — the corpus-hygiene layer a 100 TB pipeline needs
in front of KG construction. All hot paths are native Column expressions;
Python appears only in the clearly-marked multimodal decode stubs.
"""
