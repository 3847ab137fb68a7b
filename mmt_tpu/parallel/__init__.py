"""Mesh + sharding."""
