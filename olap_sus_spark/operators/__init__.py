"""Relational + pipeline operators built on the DataFrame API."""
