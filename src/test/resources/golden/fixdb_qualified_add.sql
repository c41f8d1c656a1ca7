CREATE DATABASE IF NOT EXISTS fixdb;

--------------------------------------
-- sales_part
--------------------------------------
!sh echo "Creating table: sales_part...";
CREATE TABLE spark_catalog.fixdb.sales_part (
  amount DOUBLE,
  year STRING,
  month STRING)
USING parquet
PARTITIONED BY (year, month)
LOCATION 'file:$DATA/sales_part';

!sh echo "adding partitions: fixdb.sales_part...";
ALTER TABLE fixdb.sales_part ADD PARTITION (year='2024',month='01') LOCATION "file:$DATA/sales_part/year=2024/month=01";
ALTER TABLE fixdb.sales_part ADD PARTITION (year='2024',month='02') LOCATION "file:$DATA/sales_part/year=2024/month=02";
ALTER TABLE fixdb.sales_part ADD PARTITION (year='2025',month='01') LOCATION "file:$DATA/sales_part/year=2025/month=01";

--------------------------------------
-- upper_part
--------------------------------------
!sh echo "Creating table: upper_part...";
CREATE TABLE spark_catalog.fixdb.upper_part (
  v DOUBLE,
  k STRING)
USING parquet
PARTITIONED BY (k)
LOCATION 'file:$DATA/upper_part';

!sh echo "adding partitions: fixdb.upper_part...";
ALTER TABLE fixdb.upper_part ADD PARTITION (k='Beta') LOCATION "file:$DATA/upper_part/k=Beta";
ALTER TABLE fixdb.upper_part ADD PARTITION (k='alpha') LOCATION "file:$DATA/upper_part/k=alpha";
