from hybrid_sanctions_search_engine_ray.cli import main

raise SystemExit(main())
