"""Acceptance harness: GMRES iteration-count comparison CLI (see __main__)."""
