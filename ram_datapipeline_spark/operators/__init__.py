"""Composed DataFrame operators.

Each module re-expresses one family from SURVEY §2 as declarative Spark
plans: ``eta`` (the routing core J4/J5/A1/F4), ``spatial`` (J2/J3/J7),
``relational`` (pivots, windows, latest-per-key), ``dedup`` / ``similarity``
/ ``text_analysis`` (the beyond-reference training-data operators).
"""
