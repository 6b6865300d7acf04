"""Sampling CLI (see __main__)."""
