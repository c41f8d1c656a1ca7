package graft.catalog

/** Behavioral flags of the DDL extraction, mirroring the reference's
  * env switches (`/root/reference/src/main/java/jamthoma/ExtractHiveDDL.java:25,29,79-83`).
  *
  * @param useAddSql if true, `ALTER TABLE ... ADD PARTITION` statements are
  *                  emitted instead of `MSCK REPAIR TABLE` (unless a
  *                  default partition forces MSCK — see [[PartitionRestore.decide]])
  * @param useContext if true, the script emits `USE db;` and unqualified
  *                   table names + table-relative partition locations;
  *                   if false, names and locations are fully qualified
  */
final case class ExtractConfig(useAddSql: Boolean = false, useContext: Boolean = true)

object ExtractConfig {
  /** `getBoolEnv` semantics from `ExtractHiveDDL.java:79-83`:
    * unset → default; set → `Boolean.parseBoolean` (anything but
    * case-insensitive "true" is false).
    */
  def boolEnv(env: Map[String, String], name: String, default: Boolean): Boolean =
    env.get(name).map(java.lang.Boolean.parseBoolean).getOrElse(default)

  def fromEnv(env: Map[String, String] = sys.env): ExtractConfig =
    ExtractConfig(
      useAddSql = boolEnv(env, "USE_ADD_SQL", default = false),
      useContext = boolEnv(env, "USE_CONTEXT", default = true))
}
