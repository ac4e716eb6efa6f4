"""Sources: synthetic page-table generation and testdata readers."""
