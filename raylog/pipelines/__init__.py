"""End-to-end pipeline assemblies (the reference's fluent-bit.conf analogs)."""
