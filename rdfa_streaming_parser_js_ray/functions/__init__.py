"""Scalar / small-graph helper functions shared by stages and tests."""
