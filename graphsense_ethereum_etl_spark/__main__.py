"""``python -m graphsense_ethereum_etl_spark`` — see cli.py."""

from .cli import main

if __name__ == "__main__":
    main()
