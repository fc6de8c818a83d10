"""Inner package of the compat shim — see ``marlenv/__init__.py``."""
