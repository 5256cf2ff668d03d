"""Host-side diagnostics: animation, OLR analysis."""
