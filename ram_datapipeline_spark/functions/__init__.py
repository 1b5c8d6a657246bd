"""Column-expression kits (geo, text, json).

These are the Spark analogs of the reference's scalar helpers (SURVEY §2.7):
turf.js geometry kernels, unit conversions, JSON codecs, string templating.
Everything here returns ``pyspark.sql.Column`` expressions so the plans stay
JVM-side (whole-stage codegen) — no Python in the hot path.
"""
