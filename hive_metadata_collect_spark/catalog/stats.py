"""Placeholder: operators land in a later batch this round."""
