# Route the 'datasets' package to the reference repo's local directory
# (HuggingFace datasets in site-packages would otherwise shadow the
# reference's namespace package).
__path__ = ["/root/reference/datasets"]
