from devcontainers_etl_node_spark.cli import main

raise SystemExit(main())
