"""Minimal captum shim so the reference's create_attributions.py runs
unmodified (captum is not installable in this image).  Only the surface
the reference uses (create_attributions.py:8-9,43-50) is provided."""
