"""``python -m movie_recommendation_etl_spark`` dispatches to cli.main."""

import sys

from movie_recommendation_etl_spark.cli import main

sys.exit(main())
