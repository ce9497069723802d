"""Ordered band modules of the query registry — see queries.py."""
