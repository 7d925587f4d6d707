"""Command-line entry points (flag parity with the reference CLIs)."""
