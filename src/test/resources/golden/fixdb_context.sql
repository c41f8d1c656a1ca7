CREATE DATABASE IF NOT EXISTS fixdb;
USE fixdb;


-- ERROR extracting fixdb.conflict_part: Table conflict_parthas default partition and non-lower case chars

--------------------------------------
-- defaults_part
--------------------------------------
!sh echo "Creating table: defaults_part...";
CREATE TABLE spark_catalog.fixdb.defaults_part (
  v DOUBLE,
  k STRING)
USING parquet
PARTITIONED BY (k)
LOCATION 'file:$DATA/defaults_part';

!sh echo "adding partitions: fixdb.defaults_part...";
MSCK REPAIR TABLE defaults_part;

--------------------------------------
-- fruits
--------------------------------------
!sh echo "Creating table: fruits...";
CREATE TABLE spark_catalog.fixdb.fruits (
  name STRING,
  color STRING,
  price DOUBLE)
USING parquet
LOCATION 'file:$DATA/fruits';

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
MSCK REPAIR TABLE sales_part;

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
ALTER TABLE upper_part ADD PARTITION (k='Beta') LOCATION "k=Beta";
ALTER TABLE upper_part ADD PARTITION (k='alpha') LOCATION "k=alpha";
