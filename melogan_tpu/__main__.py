"""``python -m melogan_tpu`` → the CLI."""
from melogan_tpu.cli import main

if __name__ == "__main__":
    main()
