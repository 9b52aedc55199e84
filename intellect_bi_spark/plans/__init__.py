"""NL-intent → DataFrame plan compiler, query router, and SQL sanitizer."""
