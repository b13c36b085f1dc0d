"""LLM-data-pipeline operators (dedup / similarity / text / multimodal).

Placeholder module — populated by streamprocessors_spark.functions.
"""
