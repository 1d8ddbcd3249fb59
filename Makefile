.PHONY: test bench package plans demo clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

plans:
	python tests/explain_plans.py

package:
	mkdir -p build && rm -f build/engine.zip && zip -qr build/engine.zip bodhium_webscrapper_spark
	@echo "submit with: spark-submit --py-files build/engine.zip jobs/crawl_job.py ..."

demo: package
	$$(python -c "import pyspark,os;print(os.path.join(os.path.dirname(pyspark.__file__),'bin','spark-submit'))") \
	  --master 'local[8]' --py-files build/engine.zip jobs/crawl_job.py \
	  --synthesize 10000 --workdir build/demo --budget 10 --max-waves 4

clean:
	rm -rf build/demo build/job* build/bench/ckpt_*
