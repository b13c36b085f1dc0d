"""TS data-plane queries (SURVEY §2.1-2.3): filled in by the demux pipeline.

Placeholder module — populated as the codec + demux operators land.
"""
