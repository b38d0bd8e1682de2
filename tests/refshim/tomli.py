"""tomllib re-export standing in for tomli (same API)."""
from tomllib import *  # noqa: F401,F403
from tomllib import load, loads  # noqa: F401
