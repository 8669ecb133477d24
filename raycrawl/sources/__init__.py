"""Alternate document sources feeding the same document pipeline
(SURVEY.md §2.1 S5-S7): MediaWiki API pages and JSON API items, both with
their live-HTTP tiers replaced by deterministic fixtures in this sandbox.
"""
