"""Placeholder — populated in a later milestone this round."""
