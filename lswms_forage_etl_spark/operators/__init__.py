"""Relational / window / dedup operators (SURVEY §2.2-2.8, §7)."""
