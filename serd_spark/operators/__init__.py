"""Spark DataFrame stages of the KG-construction pipeline."""
