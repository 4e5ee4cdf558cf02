"""HTTP serving layer (reference app.py capability on a stdlib WSGI stack)."""
