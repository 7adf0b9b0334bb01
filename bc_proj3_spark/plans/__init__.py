"""Headline analytical plans over the driver testdata tables."""
