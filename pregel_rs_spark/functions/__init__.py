"""Functions: HTML text/link extraction (vectorized pandas UDFs) and
text-analysis functions (language-ID, quality scoring, token counting,
fingerprinting) — all Catalyst expressions where possible."""
