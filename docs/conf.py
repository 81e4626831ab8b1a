# Sphinx configuration (reference docs/conf.py equivalent)
project = "openvqe_tpu"
author = "openvqe_tpu developers"
release = "0.1.0"
extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
html_theme = "alabaster"
exclude_patterns = ["_build"]
