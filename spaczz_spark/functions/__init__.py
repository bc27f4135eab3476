"""Vectorized column functions: shingles, signatures, ratio UDFs, text stats."""
